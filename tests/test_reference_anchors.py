"""Reference regression anchors (BASELINE.md): the literal values the
reference test suite asserts, reproduced end-to-end with getdist_tpu's own
mixtures + engine (reference getdist_test.py:45-142)."""

import os

import numpy as np
import pytest

from getdist_tpu import chains as tchains
from getdist_tpu.gaussian_mixtures import Gaussian1D, Mixture2D
from getdist_tpu.mcsamples import loadMCSamples

tchains.print_load_details = False


def bimodal0():
    return Mixture2D([[0, 2], [0, 2]], [[0.5, 0.5, 0], [0.5, 0.5, 0]], label="bimodal")


def reference_bimodal():
    # the reference fixture: Test2DDistributions().bimodal[0] (WJ1)
    return Mixture2D([[-1, 0], [1, 0]], [(2.0 / 3, 2.0 / 3, 0), (2.0 / 3, 2.0 / 3, 0)], label="bimodal WJ1")


def test_gelman_rubin_anchor(tmp_path):
    # reference getdist_test.py:45-57: R-1 = 0.00052997 for 3x4000-sample
    # bimodal chains (seed 10) with ignore_rows 0.1
    random_state = np.random.default_rng(10)
    prob = reference_bimodal()
    root = str(tmp_path / "testchain")
    for n in range(3):
        mcsamples = prob.MCSamples(4000, logLikes=True, random_state=random_state)
        mcsamples.saveAsText(root, chain_index=n)
    samples = loadMCSamples(root, settings={"ignore_rows": 0.1}, no_cache=True)
    samples.getConvergeTests(0.95)
    assert np.isclose(samples.GelmanRubin, 0.00052997, atol=1e-4 * 0.5), samples.GelmanRubin


def test_latex_anchor():
    # reference getdist_test.py:114-122
    samples = reference_bimodal().MCSamples(12000, logLikes=True, random_state=10)
    labels, texs = samples.getLatex(limit=2)
    assert (labels, texs) == (["x", "y"], ["0.0^{+2.1}_{-2.1}", "0.0^{+1.3}_{-1.3}"])
    table = samples.getTable(columns=1, limit=1, paramList=["x"])
    assert r"0.0\pm 1.2" in table.tableTex()


def test_bestfit_sample_anchor():
    # reference getdist_test.py:109-112
    samples = reference_bimodal().MCSamples(12000, logLikes=True, random_state=10)
    best = samples.getParamBestFitDict(best_sample=True)
    assert np.isclose(best["loglike"], 1.708, atol=5e-3)


def test_pca_anchor():
    # reference getdist_test.py:124-125
    bending = Mixture2D(
        [[0, 0], [2, 1.8]], [(np.sqrt(0.5), 1, 0.9), (1, 1, 0.8)], [0.6, 0.4], xmin=-1, label="bending"
    )
    samples = bending.MCSamples(12000, logLikes=True, random_state=10)
    assert "e-value: 0.10" in samples.PCA(["x", "y"])


def test_marge_limits_anchor():
    # reference getdist_test.py:128-136 (cut-correlated fixture)
    from getdist_tpu.gaussian_mixtures import Gaussian2D

    cut_correlated = Gaussian2D([0, 0], (0.7, 1, 0.95), ymin=0.3, xmax=1.2, label="cut correlated")
    samples = cut_correlated.MCSamples(12000, logLikes=False, random_state=10)
    lims = samples.getMargeStats().parWithName("x").limits
    assert np.isclose(lims[0].lower, 0.2077, atol=5e-4)
    assert np.isclose(lims[1].lower, 0.0574, atol=5e-4)
    assert lims[2].onetail_lower


@pytest.mark.slow
def test_cut_gaussian_analytic_limits():
    # reference getdist_test.py:137-142 (1.5M samples; analytic cut-Gaussian)
    samples = Gaussian1D(0, 1, xmax=1).MCSamples(1500000, logLikes=False, random_state=10)
    lims = samples.getMargeStats().parWithName("x").limits
    assert np.isclose(lims[0].lower, -0.78828, atol=5e-3)
    assert np.isclose(lims[0].upper, 0.7954, atol=5e-3)
    assert np.isclose(lims[1].lower, -1.730, atol=5e-3)


def test_mixture_marginal_conditional_identity():
    # P(x, y) = P(y) P(x|y) (reference getdist_test.py:240-254)
    from getdist_tpu.gaussian_mixtures import Mixture2D

    cov1 = [[0.001**2, 0.0006 * 0.05], [0.0006 * 0.05, 0.05**2]]
    cov2 = [[0.01**2, -0.005 * 0.03], [-0.005 * 0.03, 0.03**2]]
    mixture = Mixture2D(
        [[0.02, 0.2], [0.023, 0.09]], [cov1, cov2], names=["zobs", "t"], labels=[r"z_{\rm obs}", "t"], label="Model"
    )
    tester = 0.03
    cond = mixture.conditionalMixture(["zobs"], [tester])
    marge = mixture.marginalizedMixture(["zobs"])
    assert np.isclose(mixture.pdf([tester, 0.15]), marge.pdf([tester]) * cond.pdf([0.15]))
