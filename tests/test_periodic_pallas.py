"""2D periodic-parameter parity and Pallas kernel regression tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from getdist_tpu import chains as tchains
from getdist_tpu.mcsamples import MCSamples
from getdist_tpu.ops.pallas_kernels import pair_histograms

tchains.print_load_details = False


def test_periodic_2d_parity(reference_getdist):
    from getdist.mcsamples import MCSamples as RefMCSamples

    rng = np.random.RandomState(5)
    n = 25000
    phase = np.mod(rng.standard_normal(n) * 0.6 + 3.0, 2 * np.pi)
    other = rng.standard_normal(n)
    ranges = {"phi": [0, 2 * np.pi, True]}
    ours = MCSamples(samples=np.column_stack([phase, other]).copy(), names=["phi", "y"], ranges=ranges)
    theirs = RefMCSamples(samples=np.column_stack([phase, other]).copy(), names=["phi", "y"], ranges=ranges)
    mine = ours.get2DDensityGridData("phi", "y", get_density=True)
    ref = theirs.get2DDensityGridData("phi", "y", get_density=True)
    np.testing.assert_allclose(mine.P, ref.P, atol=2e-6)
    # periodic continuity at the wrap edge
    np.testing.assert_allclose(mine.P[:, 0], mine.P[:, -1], atol=1e-8)


def test_periodic_both_axes_parity(reference_getdist):
    from getdist.mcsamples import MCSamples as RefMCSamples

    rng = np.random.RandomState(6)
    n = 20000
    a = np.mod(rng.standard_normal(n) * 0.5, 2 * np.pi)
    b = np.mod(rng.standard_normal(n) * 0.4 + 1.0, 1.0)
    ranges = {"a": [0, 2 * np.pi, True], "b": [0, 1, True]}
    ours = MCSamples(samples=np.column_stack([a, b]).copy(), names=["a", "b"], ranges=ranges)
    theirs = RefMCSamples(samples=np.column_stack([a, b]).copy(), names=["a", "b"], ranges=ranges)
    mine = ours.get2DDensityGridData("a", "b", get_density=True)
    ref = theirs.get2DDensityGridData("a", "b", get_density=True)
    np.testing.assert_allclose(mine.P, ref.P, atol=2e-6)


def test_pallas_pair_histograms_interpret():
    rng = np.random.RandomState(0)
    p, n = 5, 4096 * 2
    ix_pm = jnp.asarray(rng.randint(0, 256, (p, n)).astype(np.uint8))
    w = jnp.asarray(rng.randint(1, 5, n).astype(np.float32))
    # 3 pairs: exercises the pad-to-group path (group=8)
    pa = jnp.asarray(np.array([0, 2, 3], np.int32))
    pb = jnp.asarray(np.array([1, 4, 4], np.int32))
    hists = np.asarray(pair_histograms(ix_pm, w, pa, pb, interpret=True))
    assert hists.shape == (3, 256, 256)
    ixn = np.asarray(ix_pm)
    wn = np.asarray(w)
    for k, (a, b) in enumerate([(0, 1), (2, 4), (3, 4)]):
        expect = np.zeros((256, 256))
        np.add.at(expect, (ixn[b], ixn[a]), wn)
        np.testing.assert_array_equal(hists[k], expect)


def test_pallas_rejects_unaligned():
    ix_pm = jnp.zeros((3, 100), jnp.uint8)
    w = jnp.ones(100, jnp.float32)
    with pytest.raises(AssertionError):
        pair_histograms(ix_pm, w, jnp.zeros(1, jnp.int32), jnp.ones(1, jnp.int32), interpret=True)


def test_pallas_grouped_pair_histograms_interpret():
    from getdist_tpu.ops.pallas_kernels import group_pairs, pair_histograms_grouped

    rng = np.random.RandomState(1)
    p, n = 6, 4096
    ix_pm = jnp.asarray(rng.randint(0, 256, (p, n)).astype(np.uint8))
    w = jnp.asarray(rng.randint(1, 5, n).astype(np.float32))
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]  # 15 pairs, ragged groups
    grp_a, grp_b, inv = group_pairs(pairs, group=4)
    hists = np.asarray(
        pair_histograms_grouped(
            ix_pm, w, jnp.asarray(grp_a), jnp.asarray(grp_b), jnp.asarray(inv), group=4, interpret=True
        )
    )
    assert hists.shape == (15, 256, 256)
    ixn, wn = np.asarray(ix_pm), np.asarray(w)
    for k, (a, b) in enumerate(pairs):
        expect = np.zeros((256, 256))
        np.add.at(expect, (ixn[b], ixn[a]), wn)
        np.testing.assert_array_equal(hists[k], expect)


def test_all_2d_static_pairs_matches_dynamic():
    from getdist_tpu.ops import batched

    rng = np.random.RandomState(2)
    n, p = 30000, 4
    s = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))
    w = jnp.asarray(rng.randint(1, 4, n).astype(np.float32))
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    pa = jnp.asarray(np.array([a for a, _ in pairs], np.int32))
    pb = jnp.asarray(np.array([b for _, b in pairs], np.int32))
    cont = jnp.asarray(np.array([0.68, 0.95], np.float32))
    d1 = batched.all_1d_densities(s, w)
    args = (s, w, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], cont)
    dyn = batched.all_2d_densities(*args, use_pallas=False)
    # interpret path unavailable through all_2d on CPU; static grouping is
    # exercised via the XLA fallback equivalence of its inputs plus the
    # grouped-kernel interpret test above; here check static arg plumbs
    stat = batched.all_2d_densities(*args, use_pallas=False, static_pairs=tuple(pairs))
    np.testing.assert_array_equal(np.asarray(dyn["P"]), np.asarray(stat["P"]))


def test_pallas_grouped_int8_exact():
    """int8 MXU histogram variant is exact for integer weights in [0, 127]."""
    from getdist_tpu.ops.pallas_kernels import group_pairs, pair_histograms_grouped

    rng = np.random.RandomState(2)
    p, n = 4, 4096
    ix_pm = jnp.asarray(rng.randint(0, 256, (p, n)).astype(np.uint8))
    w = jnp.asarray(rng.randint(0, 128, n).astype(np.float32))  # full int8 range incl. 0
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    grp_a, grp_b, inv = group_pairs(pairs, group=4)
    args = (jnp.asarray(grp_a), jnp.asarray(grp_b), jnp.asarray(inv))
    h8 = np.asarray(pair_histograms_grouped(ix_pm, w, *args, group=4, interpret=True, int8_weights=True))
    assert h8.dtype == np.float32
    ixn, wn = np.asarray(ix_pm), np.asarray(w)
    for k, (a, b) in enumerate(pairs):
        expect = np.zeros((256, 256))
        np.add.at(expect, (ixn[b], ixn[a]), wn)
        np.testing.assert_array_equal(h8[k], expect)
