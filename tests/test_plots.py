"""Plotting smoke tests (reference getdist_test.py:269-369 model)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from getdist_tpu import chains as tchains
from getdist_tpu import plots
from getdist_tpu.gaussian_mixtures import Gaussian2D, Mixture2D

tchains.print_load_details = False


@pytest.fixture(scope="module")
def samples_pair():
    g1 = Mixture2D([[-1, 0], [1, 0]], [(2 / 3, 2 / 3, 0), (2 / 3, 2 / 3, 0)], label="bimodal")
    g2 = Gaussian2D([0, 0], (0.9, 1.1, 0.3), label="gauss")
    s1 = g1.MCSamples(4000, logLikes=True, random_state=10, names=["x", "y"], labels=["x", "y"])
    s2 = g2.MCSamples(4000, logLikes=True, random_state=11, names=["x", "y"], labels=["x", "y"])
    return s1, s2


def test_plot_1d(samples_pair):
    s1, s2 = samples_pair
    g = plots.get_single_plotter(auto_close=True)
    g.plot_1d([s1, s2], "x")
    assert len(g.fig.axes) >= 1
    assert len(g.get_axes().lines) >= 2


def test_plot_2d_filled_and_lines(samples_pair):
    s1, s2 = samples_pair
    g = plots.get_single_plotter(auto_close=True)
    res = g.plot_2d([s1, s2], "x", "y", filled=True)
    assert res is not None
    g2 = plots.get_single_plotter(auto_close=True)
    g2.plot_2d([s1, s2], "x", "y", filled=False, colors=["red", "blue"])


def test_triangle_plot(samples_pair, tmp_path):
    s1, s2 = samples_pair
    g = plots.get_subplot_plotter(auto_close=True)
    g.triangle_plot([s1, s2], ["x", "y"], filled=True, legend_labels=["A", "B"])
    assert g.subplots.shape == (2, 2)
    assert g.subplots[1, 0] is not None
    # axis-limit sync invariants: diagonal x-range matches 2D subplot below
    diag_xlim = g.subplots[0, 0].get_xlim()
    assert np.allclose(diag_xlim, g.subplots[1, 0].get_xlim())
    out = tmp_path / "tri.png"
    g.export(str(out))
    assert out.exists() and out.stat().st_size > 2000


def test_triangle_upper_roots(samples_pair):
    s1, s2 = samples_pair
    g = plots.get_subplot_plotter(auto_close=True)
    g.triangle_plot([s1], ["x", "y"], upper_roots=[s2], filled=True)
    assert g.subplots[0, 1] is not None


def test_rectangle_plot(samples_pair):
    s1, s2 = samples_pair
    g = plots.get_subplot_plotter(auto_close=True)
    axes = g.rectangle_plot(["x"], ["y"], roots=[s1, s2], filled=True)
    assert len(axes) == 1 and len(axes[0]) == 1


def test_plot_3d(samples_pair):
    s1, _ = samples_pair
    g = plots.get_single_plotter(auto_close=True)
    g.plot_3d(s1, ["x", "y", "x"])
    assert g.last_scatter is not None


def test_plot_4d(samples_pair):
    s1, _ = samples_pair
    g = plots.get_single_plotter(auto_close=True)
    g.plot_4d(s1, ["x", "y", "x", "y"], color_bar=False)


def test_plots_1d_2d_grids(samples_pair):
    s1, s2 = samples_pair
    g = plots.get_subplot_plotter(auto_close=True)
    g.plots_1d([s1, s2], ["x", "y"], nx=2)
    g.plots_2d([s1, s2], param_pairs=[["x", "y"]], nx=1)


def test_mixture_overlay(samples_pair):
    s1, _ = samples_pair
    mix = Gaussian2D([0, 0], (1, 1, 0.5), names=["x", "y"])
    g = plots.get_single_plotter(auto_close=True)
    g.plot_2d([s1, mix], "x", "y", filled=False)


def test_style_switching_restores_rcparams(samples_pair):
    import matplotlib as mpl

    import getdist_tpu.styles.tab10  # noqa: F401

    orig = mpl.rcParams["font.size"]
    old = plots.set_active_style("tab10")
    g = plots.get_single_plotter(auto_close=True)
    assert isinstance(g, plots.GetDistPlotter)
    plots.set_active_style(old)
    plots.set_active_style()
    assert mpl.rcParams["font.size"] == orig


def test_marker_and_bands(samples_pair):
    s1, _ = samples_pair
    g = plots.get_single_plotter(auto_close=True)
    g.plot_1d(s1, "x", marker=0.5)
    g.add_x_bands(0, 0.5)
    g.add_y_bands(0.2, 0.1)


def test_add_2d_covariance():
    g = plots.get_single_plotter(auto_close=True)
    g.add_2d_covariance([0, 0], [[1, 0.5], [0.5, 2]])


def test_samples_for_root_from_dir(tmp_path, samples_pair):
    s1, _ = samples_pair
    root = str(tmp_path / "saved")
    s1.saveChainsAsText(root)
    g = plots.get_single_plotter(chain_dir=str(tmp_path), auto_close=True)
    loaded = g.samples_for_root("saved")
    assert loaded.paramNames.list() == ["x", "y"]
    g.plot_1d("saved", "x")
