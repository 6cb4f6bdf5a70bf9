"""Tick locator property tests (reference UtilTest, getdist_test.py:372-461)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from getdist_tpu.matplotlib_ext import BoundedMaxNLocator, SciFuncFormatter


def plot_with_params(scale, x, off, prune):
    fig, axs = plt.subplots(1, 1, figsize=(x, 1))
    axs.plot([off - scale, off + scale], [0, 1])
    axs.set_yticks([])
    axs.xaxis.set_major_locator(BoundedMaxNLocator(prune=prune))
    axs.xaxis.get_major_formatter().useOffset = False
    return fig, axs


def test_y_axis_ticks():
    fig, ax = plt.subplots(1, 1, figsize=(3, 3))
    ax.plot([0, 1], [0, 1])
    ax.yaxis.set_major_locator(BoundedMaxNLocator(prune=True))
    ax.set_ylim([0.0253, 0.02915])
    ticks = ax.get_yticks()
    np.testing.assert_allclose(ticks, [0.026, 0.027, 0.028])
    plt.close(fig)


@pytest.mark.parametrize("bounds,expected", [
    ([-5.2, 5.2], [-4, -2, 0, 2, 4]),
    ([0, 8.2], [1, 2, 3, 4, 5, 6, 7]),
])
def test_x_tick_values(bounds, expected):
    # absolute expectations only for cases robust to figure context; exact
    # reference-identical behavior is covered by the parity test below
    fig, ax = plt.subplots(1, 1, figsize=(4, 4))
    ax.plot([0, 1], [0, 1])
    ax.xaxis.set_major_locator(BoundedMaxNLocator(prune=True))
    ax.xaxis.get_major_formatter().useOffset = False
    ax.set_xlim(bounds)
    ticks = ax.get_xticks()
    assert len(ticks) == len(expected) and np.allclose(ticks, expected), (bounds, ticks)
    plt.close(fig)


def test_tick_coverage_sweep():
    # every scale/size/offset combination must give >= 1 tick, and >= 2
    # ticks for axes >= 2 inches (except the smallest scale), mirroring the
    # reference property test
    fails = []
    for x in np.arange(1, 5, 1.0):
        for scale in [1e-4, 0.9e-2, 1e-1, 1, 14, 3000]:
            for off in [scale / 3, 1, 7.4 * scale]:
                for prune in [True, False]:
                    fig, ax = plot_with_params(scale, x, off, prune)
                    fig.canvas.draw()
                    if not len(ax.get_xticks()) or x >= 2 > len(ax.get_xticks()) and scale > 1e-4:
                        fails.append([scale, x, off, prune])
                    plt.close(fig)
    assert not fails, "Too few ticks for %s" % fails


def test_parity_with_reference_locator(reference_getdist):
    from getdist.matplotlib_ext import BoundedMaxNLocator as RefLocator

    for bounds in (
        [-5.2, 5.2],
        [0.0219, 0.02232],
        [3, 3000],
        [-0.009, 0.009],
        [1, 1.0004],
        [0.0253, 0.02915],
        [-1e-4, 14],
        [7.3, 7.9],
        [0, 8.2],
    ):
        fig, axs = plt.subplots(1, 2, figsize=(8, 2))
        for ax, cls in zip(axs, [BoundedMaxNLocator, RefLocator]):
            ax.plot([bounds[0], bounds[1]], [0, 1])
            ax.xaxis.set_major_locator(cls(prune=True))
            ax.xaxis.get_major_formatter().useOffset = False
            ax.set_xlim(bounds)
        np.testing.assert_allclose(axs[0].get_xticks(), axs[1].get_xticks(), err_msg=str(bounds))
        plt.close(fig)


def test_sci_formatter():
    f = SciFuncFormatter()
    assert f(2e5) == "$2{\\times}10^{5}$"
    assert f(1e-7) == "$10^{-7}$"
    assert f.format_data(0.5).strip() == "0.5"
