"""Parity tests for the weighted-sample engine vs the reference."""

import numpy as np
import pytest

from getdist_tpu import chains as tchains
from getdist_tpu.chains import Chains, WeightedSamples

tchains.print_load_details = False


def make_correlated_samples(n=6000, seed=7):
    """MCMC-like correlated weighted samples (AR(1) + integer weights)."""
    rng = np.random.RandomState(seed)
    steps = rng.standard_normal((n, 3))
    samples = np.empty((n, 3))
    samples[0] = steps[0]
    for i in range(1, n):
        samples[i] = 0.9 * samples[i - 1] + np.sqrt(1 - 0.81) * steps[i]
    samples[:, 1] = samples[:, 1] * 2 + 1
    samples[:, 2] = samples[:, 0] * 0.5 + samples[:, 2] * 0.2
    weights = rng.randint(1, 5, size=n).astype(np.float64)
    loglikes = 0.5 * np.sum(samples**2, axis=1)
    return samples, weights, loglikes


@pytest.fixture(scope="module")
def pair():
    samples, weights, loglikes = make_correlated_samples()
    ours = WeightedSamples(samples=samples.copy(), weights=weights.copy(), loglikes=loglikes.copy())
    import getdist.chains as ref_chains

    ref_chains.print_load_details = False
    ref = ref_chains.WeightedSamples(samples=samples.copy(), weights=weights.copy(), loglikes=loglikes.copy())
    return ours, ref


def test_moments_parity(pair):
    ours, ref = pair
    np.testing.assert_allclose(ours.getMeans(), ref.getMeans(), rtol=1e-12)
    np.testing.assert_allclose(ours.getVars(), ref.getVars(), rtol=1e-10)
    np.testing.assert_allclose(ours.cov(), ref.cov(), rtol=1e-10)
    np.testing.assert_allclose(ours.corr(), ref.corr(), rtol=1e-10)
    np.testing.assert_allclose(ours.getCorrelationMatrix(), ref.getCorrelationMatrix(), rtol=1e-10)
    assert np.isclose(ours.mean(0), ref.mean(0))
    assert np.isclose(ours.var(1), ref.var(1))
    assert np.isclose(ours.std(2), ref.std(2))
    where = ours.samples[:, 0] > 0
    assert np.isclose(ours.mean(1, where), ref.mean(1, where))
    assert np.isclose(ours.var(1, where), ref.var(1, where))
    np.testing.assert_allclose(ours.cov([0, 2]), ref.cov([0, 2]), rtol=1e-10)


def test_autocorrelation_parity(pair):
    ours, ref = pair
    np.testing.assert_allclose(
        ours.getAutocorrelation(0, maxOff=300),
        ref.getAutocorrelation(0, maxOff=300),
        rtol=1e-7,
        atol=1e-10,
    )
    assert np.isclose(ours.getCorrelationLength(0), ref.getCorrelationLength(0), rtol=1e-7)
    assert np.isclose(ours.getEffectiveSamples(0), ref.getEffectiveSamples(0), rtol=1e-7)


def test_neff_gaussian_kde_parity(pair):
    ours, ref = pair
    for j in range(3):
        mine = ours.getEffectiveSamplesGaussianKDE(j)
        theirs = ref.getEffectiveSamplesGaussianKDE(j)
        assert np.isclose(mine, theirs, rtol=1e-6), (j, mine, theirs)


def test_neff_gaussian_kde_2d_parity(pair):
    ours, ref = pair
    mine = ours.getEffectiveSamplesGaussianKDE_2d(0, 1)
    theirs = ref.getEffectiveSamplesGaussianKDE_2d(0, 1)
    assert np.isclose(mine, theirs, rtol=1e-6)


def test_confidence_parity(pair):
    ours, ref = pair
    for frac in (0.05, 0.32, 0.5):
        for upper in (False, True):
            assert ours.confidence(0, frac, upper=upper) == ref.confidence(0, frac, upper=upper)
    np.testing.assert_array_equal(ours.twoTailLimits(1, 0.95), ref.twoTailLimits(1, 0.95))


def test_thin_parity(pair):
    ours, ref = pair
    np.testing.assert_array_equal(ours.thin_indices(4), ref.thin_indices(4))
    np.testing.assert_array_equal(ours.thin_indices(1), ref.thin_indices(1))
    iu, cu = ours.thin_indices_and_weights(3, ours.weights)
    ru, rc = ref.thin_indices_and_weights(3, ref.weights)
    np.testing.assert_array_equal(iu, ru)
    np.testing.assert_array_equal(cu, rc)


def test_cool_reweight_parity():
    samples, weights, loglikes = make_correlated_samples(seed=3)
    ours = WeightedSamples(samples=samples.copy(), weights=weights.copy(), loglikes=loglikes.copy())
    import getdist.chains as ref_chains

    ref = ref_chains.WeightedSamples(samples=samples.copy(), weights=weights.copy(), loglikes=loglikes.copy())
    ours.cool(0.5)
    ref.cool(0.5)
    np.testing.assert_allclose(ours.weights, ref.weights, rtol=1e-12)
    extra = 0.1 * samples[:, 0] ** 2
    ours.reweightAddingLogLikes(extra)
    ref.reweightAddingLogLikes(extra)
    np.testing.assert_allclose(ours.weights, ref.weights, rtol=1e-12)
    np.testing.assert_allclose(ours.loglikes, ref.loglikes, rtol=1e-12)


def test_multichain_gelman_rubin_parity():
    import getdist.chains as ref_chains

    ref_chains.print_load_details = False
    rng = np.random.RandomState(10)
    chain_arrays = [rng.standard_normal((2000, 2)) + [0.01 * i, 0] for i in range(3)]
    lls = [0.5 * np.sum(a**2, axis=1) for a in chain_arrays]

    ours2 = Chains(names=["x", "y"])
    ours2.loadChains("test", [a.copy() for a in chain_arrays], loglikes=[x.copy() for x in lls])
    ours2.makeSingle()
    ref2 = ref_chains.Chains(names=["x", "y"])
    ref2.ignore_lines = 0  # reference crashes slicing lists with float 0.0
    ref2.loadChains("test", [a.copy() for a in chain_arrays], loglikes=[x.copy() for x in lls])
    ref2.makeSingle()
    np.testing.assert_allclose(
        ours2.getGelmanRubinEigenvalues(), ref2.getGelmanRubinEigenvalues(), rtol=1e-8
    )
    assert np.isclose(ours2.getGelmanRubin(), ref2.getGelmanRubin(), rtol=1e-8)


def test_chains_named_access_and_derived():
    rng = np.random.RandomState(4)
    samples = rng.standard_normal((500, 2))
    c = Chains(names=["alpha", "beta"], labels=["\\alpha", "\\beta"])
    c.loadChains("mem", samples)
    pars = c.getParams()
    np.testing.assert_array_equal(pars.alpha, samples[:, 0])
    c.addDerived(samples[:, 0] + samples[:, 1], "gamma", label="\\gamma")
    assert c.paramNames.list() == ["alpha", "beta", "gamma"]
    np.testing.assert_array_equal(c.getParams().gamma, samples.sum(axis=1))
    with pytest.raises(ValueError):
        c.addDerived(samples[:, 0], "gamma")
    d = c.getParamSampleDict(3)
    assert set(d) == {"weight", "loglike", "alpha", "beta", "gamma"}


def test_makesingle_roundtrip_and_burn():
    rng = np.random.RandomState(5)
    arrays = [rng.standard_normal((100 + 10 * i, 2)) for i in range(3)]
    c = Chains(names=["a", "b"])
    c.loadChains("mem", arrays)
    c.makeSingle()
    assert c.numrows == sum(a.shape[0] for a in arrays)
    separate = c.getSeparateChains()
    assert [s.numrows for s in separate] == [a.shape[0] for a in arrays]
    np.testing.assert_array_equal(separate[1].samples, arrays[1])
    c.removeBurnFraction(0.1)
    assert c.numrows == int(round(sum(a.shape[0] for a in arrays) * 0.9))


def test_chain_file_io(tmp_path):
    rng = np.random.RandomState(6)
    samples = rng.standard_normal((200, 2))
    c = Chains(names=["a", "b"])
    c.loadChains("mem", samples)
    root = str(tmp_path / "mychain")
    c.saveAsText(root)
    assert (tmp_path / "mychain.txt").exists()
    assert (tmp_path / "mychain.paramnames").exists()
    files = tchains.chainFiles(root)
    assert len(files) == 1
    loaded = WeightedSamples(files[0])
    np.testing.assert_allclose(loaded.samples, samples, rtol=1e-7)
    # multi-chain naming
    c.saveAsText(root, chain_index=1)
    assert (tmp_path / "mychain_2.txt").exists()
    assert len(tchains.chainFiles(root)) == 2
    assert tchains.chainFiles(root, first_chain=2) == [str(tmp_path / "mychain_2.txt")]
    assert tchains.hasChainFiles(root)


def test_delete_fixed_and_filter():
    rng = np.random.RandomState(8)
    samples = np.column_stack([rng.standard_normal(300), np.full(300, 2.5), rng.standard_normal(300)])
    c = Chains(names=["a", "fix", "b"])
    c.loadChains("mem", samples)
    c.deleteFixedParams()
    assert c.paramNames.list() == ["a", "b"]
    assert c.n == 2
    c.filter(c.samples[:, 0] > 0)
    assert np.all(c.samples[:, 0] > 0)
