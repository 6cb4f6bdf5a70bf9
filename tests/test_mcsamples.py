"""End-to-end MCSamples parity vs the reference: densities, limits,
latex, convergence, PCA."""

import numpy as np
import pytest

import getdist_tpu
from getdist_tpu import chains as tchains
from getdist_tpu.mcsamples import MCSamples, loadMCSamples

tchains.print_load_details = False


def make_chain_data(seed=10, nsamp=8000, nchain=3):
    """Correlated-walk 3-param chains with a hard bound on param 2."""
    rng = np.random.RandomState(seed)
    all_samps, all_weights, all_logl = [], [], []
    for _ in range(nchain):
        steps = rng.standard_normal((nsamp, 3))
        x = np.empty((nsamp, 3))
        x[0] = steps[0]
        for i in range(1, nsamp):
            x[i] = 0.85 * x[i - 1] + np.sqrt(1 - 0.85**2) * steps[i]
        x[:, 1] = 0.6 * x[:, 0] + 0.8 * x[:, 1] + 0.5
        x[:, 2] = np.abs(x[:, 2])  # bounded at zero
        w = rng.randint(1, 4, size=nsamp).astype(float)
        ll = 0.5 * np.sum(x**2, axis=1)
        all_samps.append(x)
        all_weights.append(w)
        all_logl.append(ll)
    return all_samps, all_weights, all_logl


NAMES = ["a", "b", "c"]
LABELS = ["\\alpha", "\\beta", "\\gamma"]
RANGES = {"c": [0, None]}


@pytest.fixture(scope="module")
def pair(reference_getdist):
    from getdist.mcsamples import MCSamples as RefMCSamples
    import getdist.chains as ref_chains

    ref_chains.print_load_details = False
    samps, weights, logl = make_chain_data()
    ours = MCSamples(
        samples=[s.copy() for s in samps],
        weights=[w.copy() for w in weights],
        loglikes=[x.copy() for x in logl],
        names=NAMES,
        labels=LABELS,
        ranges=RANGES,
    )
    theirs = RefMCSamples(
        samples=[s.copy() for s in samps],
        weights=[w.copy() for w in weights],
        loglikes=[x.copy() for x in logl],
        names=NAMES,
        labels=LABELS,
        ranges=RANGES,
    )
    return ours, theirs


def test_base_statistics_parity(pair):
    ours, theirs = pair
    np.testing.assert_allclose(ours.getMeans(), theirs.getMeans(), rtol=1e-12)
    np.testing.assert_allclose(ours.fullcov, theirs.fullcov, rtol=1e-10)
    assert ours.numrows == theirs.numrows


@pytest.mark.parametrize("param", NAMES)
def test_density1d_parity(pair, param):
    ours, theirs = pair
    mine = ours.get1DDensityGridData(param)
    ref = theirs.get1DDensityGridData(param)
    np.testing.assert_allclose(mine.x, ref.x, rtol=1e-10)
    np.testing.assert_allclose(mine.P, ref.P, atol=1e-6)
    assert abs(np.max(np.abs(mine.P - ref.P))) < 1e-6


@pytest.mark.parametrize("xy", [("a", "b"), ("a", "c"), ("b", "c")])
def test_density2d_parity(pair, xy):
    ours, theirs = pair
    mine = ours.get2DDensityGridData(*xy)
    ref = theirs.get2DDensityGridData(*xy)
    np.testing.assert_allclose(mine.x, ref.x, rtol=1e-10)
    np.testing.assert_allclose(mine.y, ref.y, rtol=1e-10)
    np.testing.assert_allclose(mine.P, ref.P, atol=1e-6)
    np.testing.assert_allclose(mine.contours, ref.contours, rtol=1e-6)


def test_margestats_parity(pair):
    ours, theirs = pair
    assert str(ours.getMargeStats()) == str(theirs.getMargeStats())


def test_latex_parity(pair):
    ours, theirs = pair
    for param in NAMES:
        for limit in (1, 2):
            assert ours.getInlineLatex(param, limit=limit) == theirs.getInlineLatex(param, limit=limit)
    mine_labels, mine_texs = ours.getLatex(NAMES)
    ref_labels, ref_texs = theirs.getLatex(NAMES)
    assert mine_labels == ref_labels
    assert mine_texs == ref_texs


def test_table_parity(pair):
    ours, theirs = pair
    assert ours.getTable(columns=2).tableTex() == theirs.getTable(columns=2).tableTex()


def test_likestats_parity(pair):
    ours, theirs = pair
    assert str(ours.getLikeStats()) == str(theirs.getLikeStats())


def test_converge_tests_parity(pair):
    ours, theirs = pair
    mine = ours.getConvergeTests(what=("MeanVar", "GelmanRubin", "SplitTest", "RafteryLewis", "CorrLengths"))
    ref = theirs.getConvergeTests(what=("MeanVar", "GelmanRubin", "SplitTest", "RafteryLewis", "CorrLengths"))
    assert mine == ref
    assert np.isclose(ours.GelmanRubin, theirs.GelmanRubin, rtol=1e-8)


def test_pca_parity(pair):
    ours, theirs = pair
    assert ours.PCA(["a", "b"]) == theirs.PCA(["a", "b"])


def test_bounds_and_limits(pair):
    ours, theirs = pair
    assert ours.getLower("c") == theirs.getLower("c") == 0
    assert ours.getUpper("c") is None
    bounds = ours.getBounds()
    assert bounds.getLower("c") == 0


def test_file_roundtrip_and_cache(tmp_path, reference_getdist, monkeypatch):
    samps, weights, logl = make_chain_data(seed=3, nsamp=2000, nchain=2)
    ours = MCSamples(
        samples=samps, weights=weights, loglikes=logl, names=NAMES, labels=LABELS, ranges=RANGES
    )
    root = str(tmp_path / "saved")
    ours.saveChainsAsText(root)
    assert (tmp_path / "saved_1.txt").exists()
    assert (tmp_path / "saved.paramnames").exists()
    assert (tmp_path / "saved.ranges").exists()

    monkeypatch.setattr(getdist_tpu, "cache_dir", str(tmp_path / "cache"))
    loaded = loadMCSamples(root)
    assert loaded.paramNames.list() == NAMES
    np.testing.assert_allclose(loaded.getMeans(), ours.getMeans(), rtol=1e-7)
    # second load hits the pickle cache
    again = loadMCSamples(root)
    np.testing.assert_allclose(again.getMeans(), loaded.getMeans(), rtol=1e-12)

    # compare against reference loading the same files
    from getdist.mcsamples import MCSamples as RefMCSamples

    ref = RefMCSamples(root)
    ref.readChains(tchains.chainFiles(root))
    np.testing.assert_allclose(ref.getMeans(), loaded.getMeans(), rtol=1e-10)
    d_mine = loaded.get1DDensityGridData("a")
    d_ref = ref.get1DDensityGridData("a")
    np.testing.assert_allclose(d_mine.P, d_ref.P, atol=1e-6)


def test_density_symmetry_invariant():
    # flipped samples give flipped densities (reference test strategy,
    # getdist_test.py:144-165)
    # bounded both sides, as in the reference's own symmetry test setup
    # (getdist_test.py:144-151; the invariant only holds exactly with
    # range-snapped bins)
    rng = np.random.RandomState(11)
    x = np.clip(rng.standard_normal(20000) * 1.3, -1, 3)
    s1 = MCSamples(samples=x.copy(), names=["x"], ranges={"x": [-1, 3]})
    s2 = MCSamples(samples=-x.copy(), names=["x"], ranges={"x": [-3, 1]})
    d1 = s1.get1DDensityGridData("x")
    d2 = s2.get1DDensityGridData("x")
    assert np.allclose(d1.P, d2.P[::-1], atol=1e-5)
    np.testing.assert_allclose(d1.x, -d2.x[::-1], atol=1e-10)


def test_periodic_parameter_density():
    rng = np.random.RandomState(12)
    phase = np.mod(rng.standard_normal(30000) * 0.5 + 3.0, 2 * np.pi)
    s = MCSamples(samples=phase, names=["phi"], ranges={"phi": [0, 2 * np.pi, True]})
    d = s.get1DDensityGridData("phi")
    # periodic density continuous at the wrap point
    assert abs(d.P[0] - d.P[-1]) < 1e-8


def test_add_derived_and_combined(pair):
    ours, _ = pair
    copy = ours.copy()
    p = copy.getParams()
    copy.addDerived(p.a + p.b, "ab", label="\\alpha+\\beta")
    assert copy.paramNames.hasParam("ab")
    d = copy.get1DDensityGridData("ab")
    assert d is not None and np.max(d.P) == pytest.approx(1.0)


def test_nd_density_consistent_with_2d():
    """Raw ND histogram density (no KDE smoothing) approximates the smoothed
    2D density on coarse grids (reference tests/getdist_test.py:167-180)."""
    from getdist_tpu.gaussian_mixtures import Gaussian2D

    samps = Gaussian2D([0, 0], np.diagflat([1, 1]), xmin=-2, xmax=2, ymin=-2, ymax=2).MCSamples(
        200000, random_state=10
    )
    d2d = samps.get2DDensity("x", "y", fine_bins_2D=10, smooth_scale_2D=1, boundary_correction_order=1)
    dnd = samps.getRawNDDensity(["x", "y"], num_bins_ND=10, boundary_correction_order=1)
    assert np.allclose(d2d.P, dnd.P, atol=2e-2)


def test_nd_density_3d_parity(reference_getdist):
    """3D raw ND density grid matches the reference bin for bin."""
    from getdist.mcsamples import MCSamples as RefMCSamples

    rng = np.random.RandomState(4)
    s = rng.standard_normal((100000, 3)) * [1.0, 0.5, 2.0] + [0.0, 1.0, -1.0]
    mc = MCSamples(samples=s.copy(), names=["a", "b", "c"])
    ref = RefMCSamples(samples=s.copy(), names=["a", "b", "c"])
    dnd = mc.getRawNDDensity(["a", "b", "c"], num_bins_ND=16, normalized=True)
    drf = ref.getRawNDDensity(["a", "b", "c"], num_bins_ND=16, normalized=True)
    assert dnd.P.shape == (16, 16, 16)
    np.testing.assert_allclose(dnd.P, drf.P, atol=1e-10)
    for ax_m, ax_r in zip(dnd.axes, drf.axes):
        np.testing.assert_allclose(ax_m, ax_r)


def test_meanlikes_parity(reference_getdist):
    """Mean-likelihood grids (1D and 2D) match the reference; regression for
    read-only device-array buffers in the meanlikes paths (these previously
    crashed with 'assignment destination is read-only')."""
    from getdist.mcsamples import MCSamples as RefMCSamples

    rng = np.random.RandomState(5)
    n = 30000
    x = rng.standard_normal(n)
    y = 0.5 * x + rng.standard_normal(n)
    s = np.column_stack([x, y])
    w = rng.randint(1, 4, n).astype(float)
    ll = 0.5 * (x**2 + y**2)
    mine = MCSamples(samples=s.copy(), weights=w.copy(), loglikes=ll.copy(), names=["x", "y"])
    ref = RefMCSamples(samples=s.copy(), weights=w.copy(), loglikes=ll.copy(), names=["x", "y"])
    d1m = mine.get1DDensityGridData("x", meanlikes=True)
    d1r = ref.get1DDensityGridData("x", meanlikes=True)
    np.testing.assert_allclose(d1m.likes, d1r.likes, atol=1e-10)
    d2m = mine.get2DDensityGridData("x", "y", meanlikes=True)
    d2r = ref.get2DDensityGridData("x", "y", meanlikes=True)
    np.testing.assert_allclose(d2m.P, d2r.P, atol=1e-10)
    np.testing.assert_allclose(d2m.likes, d2r.likes, atol=1e-10)
    # ND raw grid with mean/max likes (third read-only regression site)
    ndm = mine.getRawNDDensityGridData([0, 1], meanlikes=True, maxlikes=True)
    ndr = ref.getRawNDDensityGridData([0, 1], meanlikes=True, maxlikes=True)
    np.testing.assert_allclose(ndm.likes, ndr.likes, atol=1e-12)
    np.testing.assert_allclose(ndm.maxlikes, ndr.maxlikes, atol=1e-12)
    # second-order mult-bias iteration mutates the likes buffer twice
    m2 = MCSamples(
        samples=s.copy(), weights=w.copy(), loglikes=ll.copy(), names=["x", "y"],
        settings={"mult_bias_correction_order": 2},
    )
    r2 = RefMCSamples(
        samples=s.copy(), weights=w.copy(), loglikes=ll.copy(), names=["x", "y"],
        settings={"mult_bias_correction_order": 2},
    )
    g2m = m2.get2DDensityGridData("x", "y", meanlikes=True)
    g2r = r2.get2DDensityGridData("x", "y", meanlikes=True)
    np.testing.assert_allclose(g2m.likes, g2r.likes, atol=1e-10)
