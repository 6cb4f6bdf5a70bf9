"""Planck-scale integration regression: load -> converge -> stats -> plot.

Role of the reference CI's real-chain tests (getdist_test.py:464-503, which
assert DES/Planck chain means to 6 decimals): a deterministic synthetic
27-parameter 4-chain run (tests/fixtures/realchain.py) is analysed end to
end and summary statistics are pinned to 6-decimal anchors committed here.
Any change to burn-in handling, range estimation, KDE bandwidths, boundary
corrections, or limit solving shifts these values.
"""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import getdist_tpu.chains as tchains
from getdist_tpu import plots
from getdist_tpu.mcsamples import loadMCSamples

from fixtures import realchain

tchains.print_load_details = False

# (mean, err, 95% lower, 95% upper) from the host parity path, pinned
ANCHORS = {
    "omegabh2": (2.000965, 0.075824, 1.853300, 2.152193),
    "tau": (0.055910, 0.018996, 0.019419, 0.093864),
    "xi": (0.172746, 0.099972, 0.000000, 0.350268),
    "omegal": (2.230821, 0.145087, 1.948375, 2.518227),
    "sigma8": (1.003255, 0.159833, 0.693734, 1.318923),
    "age": (-0.000233, 0.166980, -0.335371, 0.319923),
}
GELMAN_RUBIN = 0.03131690


@pytest.fixture(scope="module")
def chain_root(tmp_path_factory):
    base = tmp_path_factory.mktemp("realchain")
    return realchain.generate(base)


@pytest.fixture(scope="module")
def samples(chain_root):
    return loadMCSamples(chain_root, settings={"ignore_rows": 0.1})


def test_load_shape_and_sidecars(samples):
    assert samples.paramNames.numParams() == realchain.NP
    assert samples.paramNames.parWithName("tau").has_limits_bot
    # .properties.ini consumed
    assert samples.properties.bool("burn_removed")


def test_gelman_rubin_anchor(samples):
    assert samples.getGelmanRubin() == pytest.approx(GELMAN_RUBIN, abs=1e-6)


def test_margestats_six_decimals(samples):
    marge = samples.getMargeStats()
    for name, (mean, err, lo95, hi95) in ANCHORS.items():
        par = marge.parWithName(name)
        assert par.mean == pytest.approx(mean, abs=1e-6), name
        assert par.err == pytest.approx(err, abs=1e-6), name
        assert par.limits[1].lower == pytest.approx(lo95, abs=1e-6), name
        assert par.limits[1].upper == pytest.approx(hi95, abs=1e-6), name


def test_bounded_parameter_one_tail(samples):
    marge = samples.getMargeStats()
    xi = marge.parWithName("xi")
    # xi piles up at its lower bound: 95% interval is one-tail upper
    assert xi.limits[1].lower == 0.0
    assert xi.limits[1].limitType() in ("one tail upper limit", "two tail", ">")


def test_converge_outputs(samples, tmp_path):
    text = samples.getConvergeTests(samples.converge_test_limit, writeDataToFile=False)
    assert "var(mean)" in text or "R-1" in text
    assert "Raftery" in text


def test_pickle_cache_roundtrip(chain_root, samples):
    # a second load must hit the cache and reproduce the stats
    again = loadMCSamples(chain_root, settings={"ignore_rows": 0.1})
    assert again.getGelmanRubin() == pytest.approx(GELMAN_RUBIN, abs=1e-6)
    from getdist_tpu.mcsamples import _cache_path

    assert os.path.exists(_cache_path(chain_root))


def test_triangle_plot_renders(samples, tmp_path):
    g = plots.get_subplot_plotter(auto_close=True)
    g.triangle_plot(samples, ["omegabh2", "tau", "omegal", "sigma8"], filled=True)
    out = tmp_path / "realchain_tri.png"
    g.export(str(out))
    assert out.stat().st_size > 10000
