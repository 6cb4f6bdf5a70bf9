#!/usr/bin/env python
"""Build a standalone desktop GUI app bundle with PyInstaller.

Counterpart of the reference's per-OS app builders
(scripts/build_mac_app.py, scripts/build_windows_app.py): one
cross-platform script that generates a PyInstaller spec for the Qt GUI
entry point and runs it. Code signing / notarization / MSI packaging are
deployment-site specific and intentionally out of scope; hook points are
marked below.

Usage: python scripts/build_gui_app.py [--onefile|--zipapp] [--name NAME] [out_dir]

--zipapp builds a dependency-light portable artifact with the stdlib
``zipapp`` module instead: a single ``NAME.pyz`` containing the package and
a launcher, runnable on any machine with ``python NAME.pyz`` (Qt/streamlit
are looked up from the host environment at launch). This path needs no
third-party build tooling, so it runs end-to-end in CI.
PyInstaller mode requires: pip install pyinstaller PySide6
"""

import argparse
import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAUNCHER = '''\
import multiprocessing

# freeze support must run before anything else in a bundled app
# (role of the reference's scripts/multiprocessing_hook.py)
multiprocessing.freeze_support()

from getdist_tpu.gui.mainwindow import run_gui

run_gui()
'''

ZIPAPP_MAIN = '''\
import multiprocessing
import sys

multiprocessing.freeze_support()

if "--smoke" in sys.argv:
    # CI artifact check: the bundled package imports and the
    # toolkit-independent GUI core drives without a display server
    from getdist_tpu.gui.app_logic import GuiSession

    session = GuiSession()
    print("smoke ok:", type(session).__name__)
    sys.exit(0)

try:
    from getdist_tpu.gui.mainwindow import run_gui
except ImportError as e:
    sys.stderr.write(
        f"Qt GUI unavailable ({e}); pip install PySide6, or run the web GUI:\\n"
        "  streamlit run getdist_tpu/gui/streamlit_app.py\\n"
    )
    sys.exit(1)
run_gui()
'''


def build_zipapp(out_dir, name):
    """Portable single-file app via stdlib zipapp (no PyInstaller needed)."""
    import shutil
    import tempfile
    import zipapp

    target = os.path.join(out_dir, name + ".pyz")
    with tempfile.TemporaryDirectory() as stage:
        shutil.copytree(
            os.path.join(REPO, "getdist_tpu"),
            os.path.join(stage, "getdist_tpu"),
            ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"),
        )
        with open(os.path.join(stage, "__main__.py"), "w") as f:
            f.write(ZIPAPP_MAIN)
        zipapp.create_archive(stage, target, interpreter="/usr/bin/env python3")
    print(f"portable app written to {target} (run with: python {target})")
    return 0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir", nargs="?", default="dist")
    parser.add_argument("--name", default="GetDistTPU-GUI")
    parser.add_argument("--onefile", action="store_true", help="single-file executable instead of a folder bundle")
    parser.add_argument(
        "--zipapp",
        action="store_true",
        help="build a portable stdlib-zipapp .pyz instead of a PyInstaller bundle",
    )
    parser.add_argument(
        "--dry-run",
        action="store_true",
        help="write the launcher and print the PyInstaller command without running it (CI smoke mode)",
    )
    args = parser.parse_args()

    if args.zipapp:
        os.makedirs(args.out_dir, exist_ok=True)
        return build_zipapp(args.out_dir, args.name)

    if not args.dry_run:
        for mod, hint in (("PyInstaller", "pyinstaller"), ("PySide6", "PySide6")):
            if importlib.util.find_spec(mod) is None:
                print(f"Missing {mod}: pip install {hint}", file=sys.stderr)
                return 1

    os.makedirs(args.out_dir, exist_ok=True)
    launcher = os.path.join(args.out_dir, "_gui_launcher.py")
    with open(launcher, "w") as f:
        f.write(LAUNCHER)

    sep = ";" if os.name == "nt" else ":"
    pkg = os.path.join(REPO, "getdist_tpu")
    cmd = [
        sys.executable,
        "-m",
        "PyInstaller",
        "--noconfirm",
        "--windowed",
        "--name",
        args.name,
        "--distpath",
        args.out_dir,
        "--paths",
        REPO,
        # package data the GUI needs at runtime
        "--add-data",
        f"{os.path.join(pkg, 'analysis_defaults.ini')}{sep}getdist_tpu",
        "--add-data",
        f"{os.path.join(pkg, 'distparam_template.ini')}{sep}getdist_tpu",
        "--add-data",
        f"{os.path.join(pkg, 'styles')}{sep}getdist_tpu/styles",
        "--collect-submodules",
        "getdist_tpu",
    ]
    if args.onefile:
        cmd.append("--onefile")
    cmd.append(launcher)
    print("+", " ".join(cmd))
    if args.dry_run:
        print("dry run: launcher + command generated, PyInstaller not invoked")
        return 0
    rc = subprocess.call(cmd)
    if rc == 0:
        print(f"\nbundle written under {args.out_dir}/{args.name}")
        print("signing/notarization (mac) or MSI packaging (windows) are site-specific follow-up steps")
    return rc


if __name__ == "__main__":
    sys.exit(main())
