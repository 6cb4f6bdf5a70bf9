"""ArviZ bridge tests (skipped unless arviz is installed, mirroring the
reference's optional-dependency strategy, test_arviz_wrapper.py)."""

import importlib.util

import numpy as np
import pytest

arviz_available = importlib.util.find_spec("arviz") is not None

pytestmark = pytest.mark.skipif(not arviz_available, reason="arviz not installed")


def make_idata():
    import arviz as az
    import xarray as xr

    rng = np.random.RandomState(0)
    posterior = xr.Dataset(
        {
            "mu": (("chain", "draw"), rng.standard_normal((2, 300))),
            "theta": (("chain", "draw", "school"), rng.standard_normal((2, 300, 3))),
        },
        coords={"chain": [0, 1], "draw": np.arange(300), "school": ["a", "b", "c"]},
    )
    return az.InferenceData(posterior=posterior)


def test_conversion_shapes_and_names():
    from getdist_tpu.arviz_wrapper import arviz_to_mcsamples

    idata = make_idata()
    mcs = arviz_to_mcsamples(idata)
    assert mcs.paramNames.list() == ["mu", "theta_0", "theta_1", "theta_2"]
    assert mcs.numrows == 600
    # mean/variance consistency with raw arrays
    flat_mu = idata.posterior["mu"].values.reshape(-1)
    assert np.isclose(mcs.mean("mu"), flat_mu.mean(), atol=1e-10)
    assert np.isclose(mcs.var("mu"), flat_mu.var(), rtol=1e-8)
    # per-chain structure preserved
    assert len(mcs.getSeparateChains()) == 2


def test_conversion_coord_names_and_ranges():
    from getdist_tpu.arviz_wrapper import arviz_to_mcsamples

    idata = make_idata()
    mcs = arviz_to_mcsamples(
        idata,
        include_coords_in_name=True,
        custom_ranges={"mu": (-5, 5)},
        custom_labels={"mu": r"\mu"},
    )
    assert "theta_school_a" in mcs.paramNames.list()
    assert mcs.paramNames.parWithName("mu").label == r"\mu"
    assert mcs.ranges.getLower("mu") == -5
