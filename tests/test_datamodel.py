"""Host data-model tests: paramnames, bounds, ini files, covmat, yaml."""

import os

import numpy as np
import pytest

from getdist_tpu.covmat import CovMat
from getdist_tpu.inifile import IniError, IniFile
from getdist_tpu.paramnames import ParamInfo, ParamNames, mergeRenames
from getdist_tpu.parampriors import ParamBounds
from getdist_tpu.yaml_tools import yaml_load


PARAMNAMES_TEXT = """omegabh2\t\\Omega_b h^2\t# baryon density
omegach2\t\\Omega_c h^2
tau\t\\tau
H0*\tH_0\t# derived Hubble
sigma8*\t\\sigma_8
"""


def test_paraminfo_line_parsing():
    p = ParamInfo("x1   \\theta_{x}  # a comment")
    assert p.name == "x1" and p.label == "\\theta_{x}" and p.comment == "a comment"
    assert not p.isDerived
    d = ParamInfo("H0* H_0")
    assert d.isDerived and d.name == "H0"
    bang = ParamInfo("y !alpha")
    assert bang.label == "\\alpha"
    with pytest.raises(ValueError):
        ParamInfo(name="bad name")


def test_paramnames_file_roundtrip(tmp_path):
    fname = tmp_path / "test.paramnames"
    fname.write_text(PARAMNAMES_TEXT)
    names = ParamNames(str(fname))
    assert names.list() == ["omegabh2", "omegach2", "tau", "H0", "sigma8"]
    assert names.numDerived() == 2
    assert names.getDerivedNames() == ["H0", "sigma8"]
    assert names.parWithName("tau").label == "\\tau"
    out = tmp_path / "out.paramnames"
    names.saveAsText(str(out))
    reloaded = ParamNames(str(out))
    assert reloaded.list() == names.list()
    assert reloaded.labels() == names.labels()
    assert [p.isDerived for p in reloaded.names] == [p.isDerived for p in names.names]


def test_paramnames_parity_with_reference(tmp_path, reference_getdist):
    from getdist.paramnames import ParamNames as RefParamNames

    fname = tmp_path / "p.paramnames"
    fname.write_text(PARAMNAMES_TEXT)
    ours = ParamNames(str(fname))
    refs = RefParamNames(str(fname))
    assert ours.list() == refs.list()
    assert ours.labels() == refs.labels()
    assert str(ours) == str(refs)


def test_globs_and_renames():
    names = ParamNames(names=["x1", "x2", "y1", "y20"])
    assert [p.name for p in names.parsWithNames(["x*"])] == ["x1", "x2"]
    assert [p.name for p in names.parsWithNames(["y?"])] == ["y1"]
    names.parWithName("x1").renames = ["xone"]
    assert names.parWithName("xone").name == "x1"
    assert names.getRenames() == {"x1": ["xone"]}
    names.updateRenames({"x2": "xtwo"})
    assert names.parWithName("xtwo").name == "x2"


def test_merge_renames():
    merged = mergeRenames({"a": ["b"]}, {"b": ["c"]})
    assert set(merged.keys()) == {"a"}
    assert set(merged["a"]) == {"b", "c"}
    merged = mergeRenames({"a": []}, {"z": "w"}, keep_names_1st=True)
    assert merged["a"] == []
    assert set(merged["z"]) == {"w"}


def test_merge_renames_parity(reference_getdist):
    from getdist.paramnames import mergeRenames as ref_merge

    cases = [
        ({"a": ["b"]}, {"b": ["c"]}),
        ({"x": ["y", "z"]}, {"w": "y"}),
        ({"p": []}, {"q": ["r"]}),
    ]
    for dicts in cases:
        ours = mergeRenames(*dicts)
        theirs = ref_merge(*dicts)
        assert set(ours) == set(theirs)
        for k in ours:
            assert set(ours[k]) == set(theirs[k])


def test_param_bounds(tmp_path):
    fname = tmp_path / "test.ranges"
    fname.write_text("x1  0  N\nx2  -1  1\nphase 0 6.2832 periodic\nfixed 3 3\n")
    bounds = ParamBounds(str(fname))
    assert bounds.getLower("x1") == 0 and bounds.getUpper("x1") is None
    assert bounds.getUpper("x2") == 1
    assert "phase" in bounds.periodic
    assert bounds.fixedValueDict() == {"fixed": 3.0}
    out = tmp_path / "out.ranges"
    bounds.saveToFile(str(out))
    again = ParamBounds(str(out))
    assert again.getLower("x2") == -1 and "phase" in again.periodic
    with pytest.raises(ValueError):
        bounds.setRange("bad", ("N", "N", "periodic"))


def test_param_bounds_str_parity(tmp_path, reference_getdist):
    from getdist.parampriors import ParamBounds as RefParamBounds

    fname = tmp_path / "p.ranges"
    fname.write_text("x1  0  N\nx2  -1.5e-3  1e20\nphase 0 6.2832 T\n")
    assert str(ParamBounds(str(fname))) == str(RefParamBounds(str(fname)))


def test_inifile_basic(tmp_path):
    base = tmp_path / "base.ini"
    base.write_text("shared=1\nbval = T\nlist_entry = 1 2 3\n")
    main = tmp_path / "main.ini"
    main.write_text(
        "# a comment\nx = 1.5\nname(2) = hello\nDEFAULT(base.ini)\nshared = 2\nEND\nignored = 1\n"
    )
    ini = IniFile(str(main))
    assert ini.float("x") == 1.5
    assert ini.int("shared") == 2  # main file wins over DEFAULT
    assert ini.bool("bval") is True
    assert ini.int_list("list_entry") == [1, 2, 3]
    assert ini.array_string("name", 2) == "hello"
    assert not ini.hasKey("ignored")
    assert ini.comments["x"] == [" a comment"]  # reference keeps the space after '#'
    # duplicate key detection
    dup = tmp_path / "dup.ini"
    dup.write_text("a=1\na=2\n")
    with pytest.raises(IniError):
        IniFile(str(dup))


def test_inifile_include_and_env(tmp_path, monkeypatch):
    monkeypatch.setenv("GDTPU_TEST_VAR", "expanded")
    inc = tmp_path / "inc.ini"
    inc.write_text("from_include = $(GDTPU_TEST_VAR)/path\n")
    main = tmp_path / "m.ini"
    main.write_text("INCLUDE(inc.ini)\nown = 1\n")
    ini = IniFile(str(main))
    assert ini.string("from_include") == "expanded/path"


def test_inifile_setattr():
    class Obj:
        x = 1
        flag = False
        arr = [1.0, 2.0]

    obj = Obj()
    ini = IniFile({"x": "5", "flag": "T", "arr": "3 4"})
    ini.setAttr("x", obj)
    ini.setAttr("flag", obj)
    ini.setAttr("arr", obj)
    assert obj.x == 5 and obj.flag is True and obj.arr == ["3", "4"]


def test_inifile_parity_with_reference(tmp_path, reference_getdist):
    from getdist.inifile import IniFile as RefIniFile

    base = tmp_path / "b.ini"
    base.write_text("alpha = 0.1\nshared = base\n")
    main = tmp_path / "m.ini"
    main.write_text("shared = main\nbeta = T\nDEFAULT(b.ini)\n")
    ours = IniFile(str(main))
    theirs = RefIniFile(str(main))
    assert ours.params == theirs.params
    assert str(ours) == str(theirs)


def test_analysis_defaults_load():
    import getdist_tpu

    ini = IniFile(getdist_tpu.default_getdist_settings)
    assert ini.int("fine_bins") == 1024
    assert ini.int("fine_bins_2D") == 256
    assert ini.float_list("contours") == [0.68, 0.95, 0.99]
    assert ini.int("boundary_correction_order") == 1


def test_analysis_defaults_match_reference(reference_getdist):
    import getdist
    import getdist_tpu

    ref_ini = IniFile(getdist.default_getdist_settings)
    ours = IniFile(getdist_tpu.default_getdist_settings)
    assert ours.params == ref_ini.params


def test_covmat_roundtrip(tmp_path):
    mat = np.array([[2.0, 0.5], [0.5, 1.0]])
    cov = CovMat(matrix=mat, paramNames=["a", "b"])
    fname = tmp_path / "t.covmat"
    cov.saveToFile(str(fname))
    loaded = CovMat(str(fname))
    assert loaded.paramNames == ["a", "b"]
    np.testing.assert_allclose(loaded.matrix, mat)
    corr = loaded.correlation()
    np.testing.assert_allclose(np.diag(corr), [1, 1])
    np.testing.assert_allclose(corr[0, 1], 0.5 / np.sqrt(2))


def test_covmat_merge():
    c1 = CovMat(matrix=np.eye(2) * 2, paramNames=["a", "b"])
    c2 = CovMat(matrix=np.eye(2) * 3, paramNames=["b", "c"])
    merged = c1.mergeCovmatWhereNew(c2)
    assert merged.paramNames == ["a", "b", "c"]
    np.testing.assert_allclose(np.diag(merged.matrix), [2, 2, 3])
    assert merged.matrix[0, 2] == 0


def test_yaml_sci_notation():
    data = yaml_load("a: 1e-5\nb: -2E+3\nc: plain\n")
    assert data["a"] == 1e-5 and data["b"] == -2e3 and data["c"] == "plain"
    from getdist_tpu.yaml_tools import InputSyntaxError

    with pytest.raises(InputSyntaxError):
        yaml_load("a: [unclosed\n")
