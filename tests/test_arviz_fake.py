"""Exercise the ArviZ bridge with duck-typed stand-ins for InferenceData,
so the conversion logic is covered even without arviz/xarray installed
(the real-dependency tests live in test_arviz.py and skip when absent)."""

import numpy as np
import pytest

from getdist_tpu.arviz_wrapper import arviz_to_mcsamples


class FakeCoord:
    def __init__(self, values):
        self.values = np.asarray(values)


class FakeDataArray:
    def __init__(self, values, dims, coords=None):
        self.values = np.asarray(values)
        self.shape = self.values.shape
        self.dims = dims
        self.coords = {k: FakeCoord(v) for k, v in (coords or {}).items()}


class FakeGroup:
    def __init__(self, arrays):
        self._arrays = arrays
        first = next(iter(arrays.values()))
        self.sizes = {"chain": first.shape[0], "draw": first.shape[1]}
        self.data_vars = list(arrays)

    def __contains__(self, name):
        return name in self._arrays

    def __getitem__(self, name):
        return self._arrays[name]


class FakeIData:
    def __init__(self, **groups):
        self._groups = groups
        for name, group in groups.items():
            setattr(self, name, group)

    def __contains__(self, name):
        return name in self._groups


def make_idata(with_weights=False, with_loglikes=False):
    rng = np.random.RandomState(3)
    n_chain, n_draw = 2, 100
    groups = {
        "posterior": FakeGroup(
            {
                "mu": FakeDataArray(rng.standard_normal((n_chain, n_draw)), ("chain", "draw")),
                "theta": FakeDataArray(
                    rng.standard_normal((n_chain, n_draw, 3)),
                    ("chain", "draw", "school"),
                    coords={"school": ["a", "b", "c"]},
                ),
            }
        )
    }
    if with_weights:
        groups["sample_stats"] = FakeGroup(
            {"w": FakeDataArray(rng.random((n_chain, n_draw)) + 0.5, ("chain", "draw"))}
        )
    if with_loglikes:
        groups["log_likelihood"] = FakeGroup(
            {"obs": FakeDataArray(-rng.random((n_chain, n_draw, 4)), ("chain", "draw", "obs_id"))}
        )
    return FakeIData(**groups)


def test_names_shapes_and_moments():
    idata = make_idata()
    mcs = arviz_to_mcsamples(idata)
    assert mcs.paramNames.list() == ["mu", "theta_0", "theta_1", "theta_2"]
    assert mcs.numrows == 200
    flat = idata.posterior["mu"].values.reshape(-1)
    assert np.isclose(mcs.mean("mu"), flat.mean(), atol=1e-12)
    # coordinate-aware naming
    named = arviz_to_mcsamples(idata, include_coords_in_name=True)
    assert named.paramNames.list() == ["mu", "theta_school_a", "theta_school_b", "theta_school_c"]
    # labels carry the coordinate subscript
    assert "school" not in named.paramNames.names[1].label or named.paramNames.names[1].label


def test_weights_and_loglikes_extraction():
    idata = make_idata(with_weights=True, with_loglikes=True)
    mcs = arviz_to_mcsamples(idata, weights_var="w", loglikes_var="obs")
    raw_w = idata.sample_stats["w"].values
    assert np.allclose(mcs.weights, raw_w.reshape(-1))
    # loglikes: extra dims summed, then negated
    raw_ll = idata.log_likelihood["obs"].values.sum(axis=2)
    assert np.allclose(mcs.loglikes, -raw_ll.reshape(-1))


def test_error_paths():
    idata = make_idata()
    with pytest.raises(ValueError, match="not found"):
        arviz_to_mcsamples(idata, weights_var="nope")
    with pytest.raises(ValueError, match="posterior"):
        arviz_to_mcsamples(object())
    # var_names filtering with a warning for unknown names
    mcs = arviz_to_mcsamples(idata, var_names=["mu", "missing"])
    assert mcs.paramNames.list() == ["mu"]


def test_custom_labels_and_ranges():
    idata = make_idata()
    mcs = arviz_to_mcsamples(idata, custom_labels={"mu": r"\mu"}, custom_ranges={"mu": (-3, 3)})
    assert mcs.paramNames.parWithName("mu").label == r"\mu"
    assert mcs.ranges.getLower("mu") == -3
