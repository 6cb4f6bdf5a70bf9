"""Native C++ chain loader: correctness vs np.loadtxt and speed sanity."""

import os
import time

import numpy as np
import pytest

from getdist_tpu import _native


@pytest.fixture(scope="module")
def chain_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("native") / "chain.txt"
    rng = np.random.RandomState(0)
    data = np.column_stack(
        [rng.randint(1, 9, 50000).astype(float), rng.rand(50000) * 10, rng.standard_normal((50000, 4))]
    )
    np.savetxt(path, data, fmt="%.8e")
    return str(path), data


def test_native_matches_loadtxt(chain_file):
    path, data = chain_file
    out = _native.load_chain_text(path)
    if out is None:
        pytest.skip("native loader unavailable")
    ref = np.loadtxt(path)
    np.testing.assert_array_equal(out, ref)
    assert out.shape == data.shape


def test_native_skiprows(chain_file):
    path, _ = chain_file
    out = _native.load_chain_text(path, skiprows=100)
    if out is None:
        pytest.skip("native loader unavailable")
    np.testing.assert_array_equal(out, np.loadtxt(path, skiprows=100))


def test_native_handles_comments_and_blank_lines(tmp_path):
    path = tmp_path / "messy.txt"
    path.write_text("# header comment\n1 2 3\n\n4 5 6\n# trailing\n7 8 9\n")
    out = _native.load_chain_text(str(path))
    if out is None:
        pytest.skip("native loader unavailable")
    np.testing.assert_array_equal(out, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])


def test_native_rejects_ragged(tmp_path):
    path = tmp_path / "ragged.txt"
    path.write_text("1 2 3\n4 5\n")
    assert _native.load_chain_text(str(path)) is None  # caller falls back


def test_native_empty_file(tmp_path):
    path = tmp_path / "empty.txt"
    path.write_text("")
    out = _native.load_chain_text(str(path))
    if out is None:
        pytest.skip("native loader unavailable")
    assert out.size == 0


def test_loadnumpytxt_integration(chain_file):
    from getdist_tpu.chains import loadNumpyTxt

    path, data = chain_file
    out = loadNumpyTxt(path)
    np.testing.assert_array_equal(out, np.loadtxt(path))  # bit-identical to numpy's parse


def test_native_faster_than_loadtxt(chain_file):
    path, _ = chain_file
    if _native.load_chain_text(path) is None:
        pytest.skip("native loader unavailable")
    t0 = time.perf_counter()
    _native.load_chain_text(path)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.loadtxt(path)
    t_numpy = time.perf_counter() - t0
    # numpy 2.x has a fast C tokenizer; just require the native path is not
    # meaningfully slower (it is bit-identical and usually faster)
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)


def test_pair_histograms_clamps_out_of_range_indices():
    """An index outside [0, nbins) is a caller-contract violation; the
    kernel must clamp it (matching gdt_bin_columns' clip semantics)
    rather than write out of bounds (round-4 advisor finding)."""
    nbins = 8
    ixs = np.array(
        [[0, 3, 7, -2, 9, 4], [1, 1, 6, 5, -1, 12]], np.int32
    )
    w = np.array([1.0, 2.0, 0.5, 3.0, 4.0, 1.5])
    pairs = np.array([[0, 1]], np.int64)
    out = _native.pair_histograms(ixs, w, pairs, nbins)
    if out is None:
        pytest.skip("native pairhist unavailable")
    clipped = np.clip(ixs, 0, nbins - 1)
    expect = np.zeros((nbins, nbins))
    for i in range(ixs.shape[1]):
        expect[clipped[1, i], clipped[0, i]] += w[i]
    np.testing.assert_array_equal(out[0], expect)
