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
