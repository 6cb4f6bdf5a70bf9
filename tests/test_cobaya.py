"""Cobaya interoperability: yaml info parsing and in-memory sample import.

Covers the surface of :mod:`getdist_tpu.cobaya_interface` — parameter
classification, prior-range extraction (incl. scipy.stats distributions and
periodic flags), sampler type/temperature, post-processing blocks, and
``MCSamplesFromCobaya`` with fake Collection objects — without requiring
cobaya itself (mirrors the reference's usage in
``/root/reference/getdist/cobaya_interface.py``).
"""

import numpy as np
import pytest

from getdist_tpu import cobaya_interface as ci


def info_fixture():
    return {
        "params": {
            "a": {"prior": {"min": 0, "max": 1}, "latex": r"\alpha"},
            "b": {"prior": [-2, 2], "renames": ["bee"]},
            "c": {"derived": True, "latex": "c_d"},
            "d": 0.25,
            "e": {"prior": {"dist": "norm", "loc": 1.0, "scale": 2.0}},
            "f": {"prior": {"min": 0, "max": 6.28, "periodic": True}},
        },
        "likelihood": {"like1": None, "like2": None},
        "sampler": {"mcmc": {}},
    }


def test_param_classification():
    info = info_fixture()["params"]
    assert ci.is_sampled_param(info["a"]) and ci.is_sampled_param(info["e"])
    assert not ci.is_sampled_param(info["c"])
    assert ci.is_derived_param(info["c"])
    assert not ci.is_derived_param(info["a"])
    # bare values are fixed, strings/callables are derived
    assert ci.is_derived_param({"value": "lambda x: x"})
    assert not ci.is_derived_param(0.5)


def test_get_range_forms():
    info = info_fixture()["params"]
    assert ci.get_range(info["a"]) == (0, 1, False)
    assert ci.get_range(info["b"]) == (-2, 2, False)
    fixed = ci.get_range(info["d"])
    assert fixed == (0.25, 0.25, False)
    lo, hi, per = ci.get_range(info["e"])
    assert lo is None and hi is None and not per  # norm interval is unbounded
    assert ci.get_range(info["f"]) == (0, 6.28, True)
    with pytest.raises(ValueError):
        ci.get_range({"prior": [1, 2, 3]})


def test_info_params_includes_chi2_blocks():
    table = ci.get_info_params(info_fixture())
    assert set("abcdef") <= set(table)
    assert table["chi2"]["latex"] == r"\chi^2"
    assert "chi2__like1" in table and "chi2__like2" in table
    assert "minuslogprior" in table and "minuslogprior__0" in table


def test_post_blocks_adjust_params_and_likes():
    info = info_fixture()
    info["post"] = {
        "remove": {"likelihood": "like2", "params": ["d"]},
        "add": {"likelihood": {"like3": None}, "params": {"g": {"derived": True}}},
        "skip": 100,
    }
    table = ci.get_info_params(info)
    assert "d" not in table and "g" in table
    assert "chi2__like3" in table and "chi2__like2" not in table
    assert ci.get_sampler_temperature(info) == 1  # post-processed chains


def test_sampler_type_and_temperature():
    info = info_fixture()
    assert ci.get_sampler_type(info) == "mcmc"
    assert ci.get_sampler_temperature(info) is None
    info["sampler"] = {"polychord": {}}
    assert ci.get_sampler_type(info) == "nested"
    info["sampler"] = {"mcmc": {"temperature": 2.0}}
    assert ci.get_sampler_temperature(info) == 2.0


class _FakeFrame:
    """DataFrame-like: iterating yields column names."""

    def __init__(self, cols):
        self.columns = cols

    def __iter__(self):
        return iter(self.columns)


class _FakeCollection:
    """Just enough of a cobaya SampleCollection for MCSamplesFromCobaya."""

    def __init__(self, frame):
        self._frame = frame
        self.data = _FakeFrame(list(frame))

    def __getitem__(self, key):
        import types

        if isinstance(key, list):
            arr = np.column_stack([self._frame[k] for k in key])
        else:
            arr = np.asarray(self._frame[key])
        return types.SimpleNamespace(values=arr)


def test_mcsamples_from_cobaya_roundtrip():
    import pandas as pd

    rng = np.random.RandomState(2)
    n = 4000
    a = rng.rand(n)
    b = rng.standard_normal(n)
    c = a + b
    chi2 = a**2 + b**2
    frame = pd.DataFrame(
        {
            "weight": np.ones(n),
            "minuslogpost": 0.5 * (a**2 + b**2),
            "a": a,
            "b": b,
            "c": c,
            # cobaya collections carry the prior/chi2 derived columns too
            "minuslogprior": np.zeros(n),
            "minuslogprior__0": np.zeros(n),
            "chi2": chi2,
            "chi2__like1": chi2,
        }
    )
    info = {
        "params": {
            "a": {"prior": {"min": 0, "max": 1}},
            "b": {"prior": [-5, 5]},
            "c": {"derived": True, "latex": "c_d"},
        },
        "likelihood": {"like1": None},
        "sampler": {"mcmc": {}},
    }
    samples = ci.MCSamplesFromCobaya(info, _FakeCollection(frame), name_tag="run1")
    assert samples.paramNames.list()[:3] == ["a", "b", "c"]
    assert "chi2__like1" in samples.paramNames.list()
    assert samples.paramNames.parWithName("c").isDerived
    assert samples.ranges.getLower("a") == 0 and samples.ranges.getUpper("a") == 1
    assert samples.numrows == n
    d = samples.get1DDensityGridData("a")
    assert d is not None and d.P.max() == 1.0

    # mismatched info and collection columns must be rejected
    bad = dict(info, params={"a": info["params"]["a"], "b": info["params"]["b"]})
    with pytest.raises(AssertionError):
        ci.MCSamplesFromCobaya(bad, _FakeCollection(frame))
