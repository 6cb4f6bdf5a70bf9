"""GUI plot-script generation: scripts must be runnable and reproducible."""

import matplotlib

matplotlib.use("Agg")

import os

import pytest

from getdist_tpu import chains as tchains
from getdist_tpu.gaussian_mixtures import Gaussian2D
from getdist_tpu.gui.plot_script import generate_plot_script

tchains.print_load_details = False


@pytest.fixture(scope="module")
def chain_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gui_chains")
    s = Gaussian2D([0, 0], (1, 0.8, 0.5)).MCSamples(3000, logLikes=True, random_state=2)
    s.saveChainsAsText(str(d / "guichain"))
    return str(d)


@pytest.mark.parametrize("plot_type,params", [
    ("1d", ["x"]),
    ("2d_filled", ["x", "y"]),
    ("2d_line", ["x", "y"]),
    ("triangle", ["x", "y"]),
    ("3d", ["x", "y", "x"]),
    ("1d_grid", ["x", "y"]),
])
def test_generated_scripts_execute(chain_dir, tmp_path, plot_type, params, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = f"{plot_type}.png"
    script = generate_plot_script(
        ["guichain"], params, plot_type, chain_dir=chain_dir, export_name=out
    )
    env = {}
    exec(compile(script, "<test script>", "exec"), env)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000


def test_script_is_plain_text_runnable(chain_dir):
    script = generate_plot_script(["guichain"], ["x", "y"], "triangle", chain_dir=chain_dir)
    assert "import getdist_tpu.plots" in script
    assert "triangle_plot" in script
    compile(script, "<check>", "exec")  # syntactically valid


def test_streamlit_app_importable_without_streamlit():
    # module must import (streamlit only needed inside main())
    import getdist_tpu.gui.streamlit_app as app

    assert callable(app.main)
    assert app.load_recent_dirs() is not None
