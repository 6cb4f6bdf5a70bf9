"""GUI logic and rendering tests (no PySide/streamlit installs needed).

GuiSession (gui.app_logic) carries all GUI state; the streamlit app is
driven end-to-end through a scripted fake streamlit module, exercising the
real render code path: open directory -> select roots -> make plot ->
stats views. Reference capability anchors: getdist/gui/streamlit_app.py
open_directory/update_parameters/show_*_stats and mainwindow.py:406-941.
"""

import contextlib
import os
import sys
import types

import matplotlib

matplotlib.use("Agg")

import pytest

from getdist_tpu import chains as tchains
from getdist_tpu.gaussian_mixtures import Gaussian2D
from getdist_tpu.gui.app_logic import GuiSession, PlotSpec, analysis_settings_schema

tchains.print_load_details = False


@pytest.fixture(scope="module")
def chain_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gui_session_chains")
    s = Gaussian2D([0, 0], (1, 0.8, 0.5)).MCSamples(4000, logLikes=True, random_state=3)
    s.saveChainsAsText(str(d / "sess_chain"))
    return str(d)


@pytest.fixture(scope="module")
def grid_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("gui_grid")
    for tag, seed in (("tagA", 4), ("tagB", 5)):
        sub = base / tag / "chains"
        sub.mkdir(parents=True)
        s = Gaussian2D([0, 0], (1, 0.7, 0.3)).MCSamples(2500, logLikes=True, random_state=seed)
        s.saveChainsAsText(str(sub / f"run_{tag}"))
    return str(base)


def test_settings_schema_covers_defaults_ini():
    schema = analysis_settings_schema()
    names = {f.name for f in schema}
    # the full analysis surface (same keys as the packaged defaults ini)
    assert len(schema) >= 18
    for expected in ("fine_bins", "fine_bins_2D", "smooth_scale_1D", "max_corr_2D", "boundary_correction_order"):
        assert expected in names
    by_name = {f.name: f for f in schema}
    assert by_name["fine_bins"].type is int
    assert by_name["smooth_scale_1D"].type is float


def test_session_flow_plain_directory(chain_dir, monkeypatch, tmp_path):
    monkeypatch.setattr("getdist_tpu.gui.app_logic.RECENT_FILE", str(tmp_path / "recent"))
    session = GuiSession()
    roots = session.open_directory(chain_dir)
    assert roots == ["sess_chain"]
    assert not session.is_grid()
    session.add_root("sess_chain")
    assert session.param_list() == ["x", "y"]

    fig, script = session.make_figure(PlotSpec(plot_type="triangle", x_params=["x", "y"]))
    assert fig is not None
    assert "triangle_plot" in script

    assert "Marginalized limits" in session.marge_stats("sess_chain")
    assert "-log(Like)" in session.like_stats("sess_chain") or "Best fit" in session.like_stats("sess_chain")
    converge = session.converge_stats("sess_chain")
    assert "N_eff" in converge and "Raftery" in converge
    assert "PCA" in session.pca_report("sess_chain", ["x", "y"])
    assert "\\begin{tabular}" in session.latex_table("sess_chain")


def test_session_root_ordering(chain_dir):
    session = GuiSession()
    session.root_order = ["a", "b", "c"]
    session.move_root("c", -1)
    assert session.root_order == ["a", "c", "b"]
    session.move_root("a", +5)
    assert session.root_order == ["c", "b", "a"]
    session.remove_root("b")
    assert session.root_order == ["c", "a"]
    session.set_roots(["a", "c", "d"])
    assert session.root_order == ["c", "a", "d"]


def test_session_grid_browsing(grid_dir):
    session = GuiSession()
    roots = session.open_directory(grid_dir)
    assert session.is_grid()
    assert session.param_tags() == ["tagA", "tagB"]
    assert session.roots_for_tag("tagA") == ["run_tagA"]
    assert set(roots) == {"run_tagA", "run_tagB"}
    session.add_root("run_tagB")
    fig, script = session.make_figure(PlotSpec(plot_type="1d", x_params=["x"]))
    assert fig is not None


@pytest.fixture(scope="module")
def tagged_grid_dir(tmp_path_factory):
    """Grid whose root names carry paramtag_datatag structure (the two-level
    browsing layout of reference batch grids)."""
    base = tmp_path_factory.mktemp("gui_grid_tagged")
    for name, seed in (("base_plikTT", 6), ("base_lowl", 7)):
        sub = base / "base" / "chains"
        sub.mkdir(parents=True, exist_ok=True)
        s = Gaussian2D([0, 0], (1, 0.7, 0.3)).MCSamples(2000, logLikes=True, random_state=seed)
        s.saveChainsAsText(str(sub / name))
    return str(base)


def test_session_data_tag_browsing(tagged_grid_dir):
    """Second-level grid navigation: param tag -> data tag -> roots
    (reference mainwindow.py setParamTag/setDataTag)."""
    session = GuiSession()
    session.open_directory(tagged_grid_dir)
    assert session.is_grid()
    assert session.param_tags() == ["base"]
    assert session.data_tags("base") == ["lowl", "plikTT"]
    assert session.roots_for_tag("base", "plikTT") == ["base_plikTT"]
    assert session.roots_for_tag("base", "lowl") == ["base_lowl"]
    assert session.roots_for_tag("base") == ["base_lowl", "base_plikTT"]


def test_param_table_tabs_and_changed_settings(chain_dir):
    """Per-limit LaTeX parameter tables (reference DialogParamTables) and
    the non-default settings summary."""
    session = GuiSession()
    session.open_directory(chain_dir)
    session.add_root("sess_chain")
    tabs = session.param_table_tabs("sess_chain")
    assert len(tabs) >= 2
    for label, tex in tabs:
        assert label.endswith("%")
        assert "\\begin{tabular}" in tex
    assert tabs[0][0] == "68%" and tabs[1][0] == "95%"
    # tables genuinely differ between limits
    assert tabs[0][1] != tabs[1][1]

    assert session.changed_settings() == {}
    session.apply_analysis_settings({"fine_bins": 512})
    session.apply_plot_settings({"linewidth": 2.0})
    session.set_plot_module("getdist_tpu.styles.planck")
    changed = session.changed_settings()
    assert changed["analysis"] == {"fine_bins": 512}
    assert changed["plot"] == {"linewidth": 2.0}
    assert changed["style"] == "getdist_tpu.styles.planck"


def test_rectangle_and_validation(chain_dir):
    session = GuiSession()
    session.open_directory(chain_dir)
    session.add_root("sess_chain")
    spec = PlotSpec(plot_type="rectangle", x_params=["x"], y_params=[])
    assert spec.problems()
    spec.y_params = ["y"]
    fig, script = session.make_figure(spec)
    assert "rectangle_plot" in script


def test_analysis_settings_invalidate_plotter(chain_dir):
    session = GuiSession()
    session.open_directory(chain_dir)
    session.add_root("sess_chain")
    first = session.plotter()
    session.apply_analysis_settings({"fine_bins": 512})
    assert session.plotter() is not first
    assert session.analysis_settings == {"fine_bins": 512}
    session.reset_analysis_settings()
    assert session.analysis_settings == {}


# ---------------------------------------------------------------------------
# fake-streamlit end-to-end drive
# ---------------------------------------------------------------------------


class _Recorder:
    def __init__(self):
        self.figures = []
        self.texts = []
        self.codes = []
        self.errors = []


class FakeStreamlit(types.ModuleType):
    """Scripted streamlit stand-in: widgets return canned answers by label,
    layout contexts are no-ops, and outputs are recorded for assertions."""

    def __init__(self, answers, pressed):
        super().__init__("streamlit")
        self.answers = answers
        self.pressed = pressed
        self.session_state = {}
        self.rec = _Recorder()

    # -- widgets -----------------------------------------------------------
    def _answer(self, label, default):
        return self.answers.get(label, default)

    def text_input(self, label, value="", **kw):
        return self._answer(label, value)

    def selectbox(self, label, options, index=0, **kw):
        return self._answer(label, list(options)[index] if options else None)

    def multiselect(self, label, options, default=None, **kw):
        picked = self._answer(label, default if default is not None else [])
        return [p for p in picked if p in list(options)]

    def button(self, label, **kw):
        return label in self.pressed

    def checkbox(self, label, value=False, **kw):
        return bool(self._answer(label, value))

    def number_input(self, label, value=0, **kw):
        return self._answer(label, value)

    def text_area(self, label, value="", **kw):
        body = self._answer(label, value)
        self.rec.codes.append(body)
        return body

    def write(self, *a, **kw):
        pass

    def radio(self, label, options, **kw):
        return self._answer(label, list(options)[0])

    def download_button(self, *a, **kw):
        return False

    # -- layout ------------------------------------------------------------
    @contextlib.contextmanager
    def _ctx(self):
        yield self

    def __getattr__(self, name):
        raise AttributeError(name)

    @property
    def sidebar(self):
        return self._ctx()

    def expander(self, *a, **kw):
        return self._ctx()

    def columns(self, spec, **kw):
        n = spec if isinstance(spec, int) else len(spec)
        return [_FakeColumn(self) for _ in range(n)]

    def tabs(self, labels):
        return [self._ctx() for _ in labels]

    def set_page_config(self, **kw):
        pass

    def title(self, *a):
        pass

    def header(self, *a):
        pass

    def caption(self, *a):
        pass

    def markdown(self, *a, **kw):
        pass

    def divider(self):
        pass

    def rerun(self):
        raise RuntimeError("rerun not expected in scripted flow")

    # -- outputs -------------------------------------------------------------
    def pyplot(self, fig, **kw):
        self.rec.figures.append(fig)

    def text(self, body):
        self.rec.texts.append(str(body))

    def code(self, body, **kw):
        self.rec.codes.append(body)

    def info(self, *a):
        pass

    def warning(self, body):
        self.rec.errors.append(("warning", str(body)))

    def error(self, body):
        self.rec.errors.append(("error", str(body)))


class _FakeColumn:
    def __init__(self, st):
        self._st = st

    def __enter__(self):
        return self._st

    def __exit__(self, *exc):
        return False

    def __getattr__(self, name):
        return getattr(self._st, name)


def _drive_app(fake, monkeypatch):
    monkeypatch.setitem(sys.modules, "streamlit", fake)
    import getdist_tpu.gui.streamlit_app as app

    monkeypatch.setattr(sys, "argv", ["streamlit_app.py"])
    app.main()
    return fake.rec


def test_streamlit_full_flow(chain_dir, monkeypatch, tmp_path):
    monkeypatch.setattr("getdist_tpu.gui.app_logic.RECENT_FILE", str(tmp_path / "recent"))
    fake = FakeStreamlit(
        answers={
            "Chain directory or grid path": chain_dir,
            "Roots": ["sess_chain"],
            "X parameters": ["x", "y"],
            "Plot type": "triangle",
            "Root": "sess_chain",
            "View": "Marginalized stats",
        },
        pressed={"Open directory", "Make plot"},
    )
    rec = _drive_app(fake, monkeypatch)
    assert not [e for e in rec.errors if e[0] == "error"], rec.errors
    assert rec.figures, "Make plot should render a figure"
    assert any("triangle_plot" in c for c in rec.codes), "script preview should show"
    assert any("Marginalized limits" in t for t in rec.texts), "marge stats text should render"


def test_streamlit_stats_views(chain_dir, monkeypatch, tmp_path):
    monkeypatch.setattr("getdist_tpu.gui.app_logic.RECENT_FILE", str(tmp_path / "recent"))
    for view, needle in (
        ("Convergence", "N_eff"),
        ("PCA", "PCA"),
    ):
        fake = FakeStreamlit(
            answers={
                "Chain directory or grid path": chain_dir,
                "Roots": ["sess_chain"],
                "X parameters": ["x"],
                "Plot type": "1d",
                "Root": "sess_chain",
                "View": view,
                "PCA parameters": ["x", "y"],
            },
            pressed={"Open directory"},
        )
        rec = _drive_app(fake, monkeypatch)
        assert any(needle in t for t in rec.texts), (view, rec.texts[:1])


def test_streamlit_grid_data_tag_flow(tagged_grid_dir, monkeypatch, tmp_path):
    """Drive the web GUI through two-level grid browsing down to a plot."""
    monkeypatch.setattr("getdist_tpu.gui.app_logic.RECENT_FILE", str(tmp_path / "recent"))
    fake = FakeStreamlit(
        answers={
            "Chain directory or grid path": tagged_grid_dir,
            "Parameter tag": "base",
            "Data tag": "plikTT",
            "Roots": ["base_plikTT"],
            "X parameters": ["x"],
            "Plot type": "1d",
            "Figure width (inch, 0=auto)": 8.0,
            "Root": "base_plikTT",
            "View": "Marginalized stats",
        },
        pressed={"Open directory", "Make plot"},
    )
    rec = _drive_app(fake, monkeypatch)
    assert not [e for e in rec.errors if e[0] == "error"], rec.errors
    assert rec.figures
    # the figure-width control reaches the generated single-plot script
    assert any("width_inch=8.0" in c for c in rec.codes), rec.codes[:1]


def test_streamlit_latex_table_tabs(chain_dir, monkeypatch, tmp_path):
    """The LaTeX-table stats view renders one tab per confidence limit."""
    monkeypatch.setattr("getdist_tpu.gui.app_logic.RECENT_FILE", str(tmp_path / "recent"))
    fake = FakeStreamlit(
        answers={
            "Chain directory or grid path": chain_dir,
            "Roots": ["sess_chain"],
            "X parameters": ["x"],
            "Plot type": "1d",
            "Root": "sess_chain",
            "View": "LaTeX table",
        },
        pressed={"Open directory"},
    )
    rec = _drive_app(fake, monkeypatch)
    assert not [e for e in rec.errors if e[0] == "error"], rec.errors
    tables = [c for c in rec.codes if "\\begin{tabular}" in c]
    assert len(tables) >= 2, "one LaTeX table per confidence limit"


def test_plot_settings_schema_and_parsing():
    from getdist_tpu.gui.app_logic import parse_plot_setting, plot_settings_schema
    from getdist_tpu.plots import _PLOT_SETTING_DEFAULTS

    schema = plot_settings_schema()
    names = {f.name for f in schema}
    # full style surface: every GetDistPlotSettings knob is editable
    assert names == set(_PLOT_SETTING_DEFAULTS)
    by_name = {f.name: f for f in schema}
    assert by_name["num_plot_contours"].type is int
    assert by_name["alpha_filled_add"].type is float
    assert by_name["line_labels"].type is bool
    # python-literal parsing for container/None-valued knobs
    assert parse_plot_setting(by_name["line_styles"], "['-k', '--r']") == ["-k", "--r"]
    assert parse_plot_setting(by_name["plot_args"], "None") is None
    # bare words (e.g. colormap names) pass through as strings
    assert parse_plot_setting(by_name["colormap"], "viridis") == "viridis"


def test_script_settings_rewrites():
    from getdist_tpu.gui.app_logic import (
        update_script_analysis_settings,
        update_script_plot_settings,
    )

    script = "from getdist_tpu import plots\ng=plots.get_subplot_plotter(chain_dir=r'/tmp')\nroots = ['a']\ng.triangle_plot(roots, ['x'])\n"
    with_style = update_script_plot_settings(script, {"num_plot_contours": 3, "colormap": "viridis"})
    assert "g.settings.num_plot_contours = 3" in with_style
    assert "g.settings.colormap = 'viridis'" in with_style
    # settings lines land after the plotter construction
    assert with_style.index("g=") < with_style.index("g.settings.")
    # re-applying replaces, not duplicates
    again = update_script_plot_settings(with_style, {"num_plot_contours": 4})
    assert again.count("g.settings.") == 1 and "= 4" in again

    with_analysis = update_script_analysis_settings(script, {"fine_bins": 512})
    assert "analysis_settings = {'fine_bins': 512}" in with_analysis
    assert "analysis_settings=analysis_settings)" in with_analysis
    # removal round-trip
    cleared = update_script_analysis_settings(with_analysis, {})
    assert "analysis_settings" not in cleared.replace("analysis_settings=analysis_settings", "")


def test_session_plot_settings_and_script_reexec(chain_dir):
    """Plot-style overrides flow into the generated script, and an edited
    script re-executes for the preview (the reference's editable script
    pane, mainwindow.py:1637-1760)."""
    session = GuiSession()
    session.open_directory(chain_dir)
    session.add_root("sess_chain")
    session.apply_plot_settings({"num_plot_contours": 1})
    fig, script = session.make_figure(PlotSpec(plot_type="2d_filled", x_params=["x", "y"]))
    assert fig is not None
    assert "g.settings.num_plot_contours = 1" in script
    # user edits the script text; the edit is honored, not regenerated away
    edited = script.replace("g.settings.num_plot_contours = 1", "g.settings.num_plot_contours = 3")
    fig2 = session.run_script(edited)
    assert fig2 is not None and fig2 is not fig
    with pytest.raises(ValueError):
        session.run_script("x = 1")
    session.reset_plot_settings()
    assert session.custom_plot_settings == {}


def test_streamlit_multi_root_compare(chain_dir, grid_dir, monkeypatch, tmp_path):
    """Multi-root stats comparison renders stats text per root."""
    monkeypatch.setattr("getdist_tpu.gui.app_logic.RECENT_FILE", str(tmp_path / "recent"))
    fake = FakeStreamlit(
        answers={
            "Chain directory or grid path": grid_dir,
            "Parameter tag": "(all)",
            "Roots": ["run_tagA", "run_tagB"],
            "X parameters": ["x"],
            "Plot type": "1d",
            "Root": "(compare all roots)",
            "View": "Marginalized stats",
        },
        pressed={"Open directory"},
    )
    rec = _drive_app(fake, monkeypatch)
    assert sum("Marginalized limits" in t for t in rec.texts) == 2


def test_mainwindow_importable_without_qt():
    import getdist_tpu.gui.mainwindow as mw

    assert callable(mw.run_gui)


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("PySide6"), reason="PySide6 not installed"
)
def test_mainwindow_offscreen_instantiation(chain_dir):
    os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")
    from PySide6.QtWidgets import QApplication

    import getdist_tpu.gui.mainwindow as mw

    app = QApplication.instance() or QApplication([])
    win = mw.MainWindow()
    win._open_path(chain_dir)
    win.add_root("sess_chain")
    assert win.session.param_list() == ["x", "y"]
    win.close()


def test_syntax_highlight_rule_tables():
    # rule tables are plain data, valid regexes, and cover the core styles
    import re

    from getdist_tpu.gui import SyntaxHighlight as sh

    assert len(sh.RULES) >= 10
    for _, rx, style in sh.RULES:
        re.compile(rx)
        assert style in sh.STYLES
    sample = "def f(x):\n    return str(x) + 'a'  # comment"
    hits = {name for name, rx, _ in sh.RULES if re.search(rx, sample)}
    assert {"keyword", "defname", "builtin", "string1", "comment"} <= hits
