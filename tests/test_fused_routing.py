"""Routing the user-facing API through the fused device pipeline.

With GETDIST_TPU_FUSED=1 (the default on accelerator backends),
get1DDensityGridData / get2DDensityGridData / getMargeStats serve results
from ONE fused program run instead of per-parameter host pipelines, within
KDE tolerance of the parity path (which remains byte-exact on plain CPU).
Spec: VERDICT round-1 item 5; reference call sites mcsamples.py:2442-2457.
"""

import numpy as np
import pytest

import getdist_tpu.chains as tchains
from getdist_tpu import MCSamples, plots

tchains.print_load_details = False


@pytest.fixture()
def forced_fused(monkeypatch):
    monkeypatch.setenv("GETDIST_TPU_FUSED", "1")


@pytest.fixture(scope="module")
def sample_pair():
    rng = np.random.default_rng(17)
    n = 40000
    x = rng.normal(size=n)
    y = 0.6 * x + 0.8 * rng.normal(size=n)
    z = np.abs(rng.normal(size=n))
    def build():
        return MCSamples(
            samples=np.c_[x, y, z],
            names=["x", "y", "z"],
            labels=["x", "y", "z"],
            ranges={"z": [0, None]},
        )
    return build


def test_routed_densities_match_parity(sample_pair, forced_fused, monkeypatch):
    routed = sample_pair()
    assert routed._fused_route_enabled()
    d2r = routed.get2DDensityGridData("x", "y")
    d1r = routed.get1DDensityGridData("x")
    monkeypatch.setenv("GETDIST_TPU_FUSED", "0")
    host = sample_pair()
    assert not host._fused_route_enabled()
    d2h = host.get2DDensityGridData("x", "y")
    d1h = host.get1DDensityGridData("x")
    grid = np.linspace(max(d1r.x[0], d1h.x[0]), min(d1r.x[-1], d1h.x[-1]), 300)
    assert np.max(np.abs(d1r.Prob(grid) / d1r.P.max() - d1h.Prob(grid) / d1h.P.max())) < 6e-3
    gx = np.linspace(max(d2r.x[0], d2h.x[0]), min(d2r.x[-1], d2h.x[-1]), 80)
    gy = np.linspace(max(d2r.y[0], d2h.y[0]), min(d2r.y[-1], d2h.y[-1]), 80)
    X, Y = np.meshgrid(gx, gy)
    fr = d2r(X.ravel(), Y.ravel(), grid=False) / d2r.P.max()
    fh = d2h(X.ravel(), Y.ravel(), grid=False) / d2h.P.max()
    sel = fh > 0.05
    assert np.max(np.abs(fr[sel] - fh[sel])) < 1.5e-2


def test_routed_2d_transpose_query(sample_pair, forced_fused):
    s = sample_pair()
    fwd = s.get2DDensityGridData("x", "y")
    rev = s.get2DDensityGridData("y", "x")
    assert np.allclose(rev.P, fwd.P.T)
    assert np.allclose(rev.x, fwd.y)


def test_routed_margestats_within_tolerance(sample_pair, forced_fused, monkeypatch):
    routed = sample_pair()
    marge_r = routed.getMargeStats()
    monkeypatch.setenv("GETDIST_TPU_FUSED", "0")
    host = sample_pair()
    marge_h = host.getMargeStats()
    for name in ("x", "y", "z"):
        pr = marge_r.parWithName(name)
        ph = marge_h.parWithName(name)
        for k in range(2):
            for attr in ("lower", "upper"):
                lr = getattr(pr.limits[k], attr)
                lh = getattr(ph.limits[k], attr)
                assert abs(lr - lh) < 0.05 * max(ph.err, 1e-30), (name, k, attr, lr, lh)


def test_routed_triangle_plot_single_program(sample_pair, forced_fused):
    import matplotlib

    matplotlib.use("Agg")
    s = sample_pair()
    g = plots.get_subplot_plotter(auto_close=True)
    g.triangle_plot(s, filled=True)
    # all pair queries should have hit one fused cache
    assert s._fused_cache is not None


def test_routing_disabled_on_non_default_settings(sample_pair, forced_fused):
    s = sample_pair()
    s.smooth_scale_1D = 0.5
    assert not s._fused_route_enabled()


def test_routed_meanlikes_served_from_fused(sample_pair, forced_fused, monkeypatch):
    rng = np.random.default_rng(5)
    n = 30000
    x = rng.normal(size=n)
    y = 0.5 * x + rng.normal(size=n)
    s = MCSamples(samples=np.c_[x, y], loglikes=0.5 * (x * x + y * y), names=["x", "y"], labels=["x", "y"])
    d2 = s.get2DDensityGridData("x", "y", meanlikes=True)
    assert getattr(d2, "likes", None) is not None
    assert d2.likes.max() == 1.0
    d1 = s.get1DDensityGridData("x", meanlikes=True)
    assert d1.likes is not None
    # both variants cached independently
    assert set(s._fused_cache) == {True} or set(s._fused_cache) == {True, False}
