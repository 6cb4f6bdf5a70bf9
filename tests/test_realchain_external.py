"""Acceptance tests against REAL external chains, when available.

The reference gates an end-to-end test on the ``getdist_testchains`` repo
(``/root/reference/getdist/tests/getdist_test.py:464-503``, enabled in its
CI by cloning that repo). This build's standing substitute is the synthetic
27-parameter Planck-scale fixture (tests/test_realchain.py); these tests
add the same real-chain hook, skip-gated on either:

- ``GETDIST_TESTCHAINS`` pointing at a checkout of
  https://github.com/cmbant/getdist_testchains (the ``cobaya`` subdir), or
- a ``getdist_testchains/cobaya`` directory next to the repo root.

The anchors are the reference's own published values, so passing here means
real Planck/DES chains analyze identically to upstream getdist.
"""

import os
from pathlib import Path

import pytest

from getdist_tpu import loadMCSamples
from getdist_tpu.parampriors import ParamBounds


def _chains_dir():
    env = os.environ.get("GETDIST_TESTCHAINS")
    if env:
        path = Path(env)
        return path if (path / "DES_shear.paramnames").exists() else path / "cobaya"
    fallback = Path(__file__).resolve().parents[2] / "getdist_testchains" / "cobaya"
    return fallback


pytestmark = pytest.mark.skipif(
    not _chains_dir().exists(),
    reason="real test chains not present (set GETDIST_TESTCHAINS or clone getdist_testchains)",
)


def test_des_shear_chain(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    root = str(_chains_dir() / "DES_shear")
    samples = loadMCSamples(root, settings={"ignore_rows": 0.3}, no_cache=True)
    assert abs(samples.mean("ombh2") - 0.02764592190482377) < 1e-6
    pars = samples.getParamSampleDict(10)
    assert abs(pars["mnu"] - 0.06) < 1e-6
    assert abs(samples.getUpper("ns") - 1.07) < 1e-6
    assert abs(samples.getLower("ns") - 0.87) < 1e-6
    assert samples.getLower("DES_DzS2") is None
    assert abs(pars["omk"]) < 1e-12

    from getdist_tpu.command_line import getdist_command

    res = getdist_command([root])
    assert "-log(Like) = 95.49" in res, res


def test_planck_chain(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    root = str(_chains_dir() / "compare_devel_drag")
    samples = loadMCSamples(root, settings={"ignore_rows": 0.3}, no_cache=True)
    assert abs(samples.mean("ombh2") - 0.0223749) < 1e-6
    assert abs(samples.getUpper("H0") - 100) < 1e-6
    assert samples.getLower("sigma8") is None
    samples.saveAsText(str(tmp_path / "planck_test"))
    ranges = ParamBounds(str(tmp_path / "planck_test.ranges"))
    for par in samples.paramNames.names:
        assert samples.getUpper(par.name) == ranges.getUpper(par.name)
        assert samples.getLower(par.name) == ranges.getLower(par.name)
