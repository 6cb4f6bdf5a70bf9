"""Native (C++) runtime components, loaded via ctypes.

Currently: the multi-threaded chain text loader (fastloader.cpp), a drop-in
accelerated path for ``np.loadtxt`` chain ingestion (the host-side hot loop
of ``loadMCSamples``; reference ``chains.py:115``). Compiled on first use
with g++ and cached next to the source; every entry point degrades
gracefully to the numpy implementation when a compiler is unavailable or
parsing fails, so behavior is never worse than the reference.

Set ``GETDIST_TPU_NO_NATIVE=1`` to disable.
"""

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
_lib = None
_lib_failed = False


def _build_library(name="fastloader"):
    source = os.path.join(_here, f"{name}.cpp")
    out = os.path.join(_here, f"_{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(source):
        return out
    # build in a temp file then move, so concurrent imports don't race
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_here)
    os.close(fd)
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        source,
        "-o",
        tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
        return out
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(f"native build failed: {e}")


def _get_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("GETDIST_TPU_NO_NATIVE"):
        _lib_failed = True
        return None
    try:
        path = _build_library()
        lib = ctypes.CDLL(path)
        lib.gdt_parse_chain.restype = ctypes.c_int
        lib.gdt_parse_chain.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_char_p,
            ctypes.c_long,
        ]
        lib.gdt_free.restype = None
        lib.gdt_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception as e:
        logging.debug("native fastloader unavailable (%s); using numpy loader", e)
        _lib_failed = True
    return _lib


_hist_lib = None
_hist_failed = False


def _get_hist_library():
    global _hist_lib, _hist_failed
    if _hist_lib is not None or _hist_failed:
        return _hist_lib
    if os.environ.get("GETDIST_TPU_NO_NATIVE"):
        _hist_failed = True
        return None
    try:
        path = _build_library("pairhist")
        lib = ctypes.CDLL(path)
        lib.gdt_pair_hists.restype = ctypes.c_int
        lib.gdt_pair_hists.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        lib.gdt_bin_columns.restype = ctypes.c_int
        lib.gdt_bin_columns.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        _hist_lib = lib
    except Exception as e:
        logging.debug("native pairhist unavailable (%s); using numpy", e)
        _hist_failed = True
    return _hist_lib


def _n_threads():
    try:
        return max(1, min(8, os.cpu_count() or 1))
    except Exception:
        return 1


def pair_histograms(ixs, weights, pairs, nbins):
    """Exact f64 pair histograms (K, nbins, nbins), rows = b, cols = a —
    bit-identical to per-pair np.bincount over ``ib * nbins + ia`` (same
    per-pair sample accumulation order), pairs fanned across threads.
    Returns None on any failure so callers can fall back to numpy."""
    lib = _get_hist_library()
    if lib is None:
        return None
    ixs = np.ascontiguousarray(ixs, np.int32)
    weights = np.ascontiguousarray(weights, np.float64)
    pair_arr = np.ascontiguousarray(pairs, np.int64).reshape(-1, 2)
    p, n = ixs.shape
    k = pair_arr.shape[0]
    out = np.zeros((k, nbins * nbins), np.float64)
    rc = lib.gdt_pair_hists(
        ixs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        p,
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(pair_arr[:, 0]).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(pair_arr[:, 1]).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        k,
        nbins,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _n_threads(),
    )
    if rc != 0:
        logging.debug("native pair_histograms failed rc=%d", rc)
        return None
    return out.reshape(k, nbins, nbins)


def bin_columns(samples, range_min, dx, nbins):
    """(P, N) int32 bin indices for (N, P) f64 samples — bit-identical to
    ``((x - lo) / dx).astype(int)`` clipped to [0, nbins); None on failure."""
    lib = _get_hist_library()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, np.float64)
    n, p = samples.shape
    range_min = np.ascontiguousarray(range_min, np.float64)
    dx = np.ascontiguousarray(dx, np.float64)
    out = np.empty((p, n), np.int32)
    rc = lib.gdt_bin_columns(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        p,
        range_min.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dx.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nbins,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _n_threads(),
    )
    if rc != 0:
        logging.debug("native bin_columns failed rc=%d", rc)
        return None
    return out


def load_chain_text(fname, skiprows=0):
    """Parse a whitespace-separated numeric text file to a (rows, cols)
    float64 array with the native loader; returns None on any failure so
    callers can fall back to np.loadtxt."""
    lib = _get_library()
    if lib is None:
        return None
    data_ptr = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    err = ctypes.create_string_buffer(256)
    rc = lib.gdt_parse_chain(
        os.fsencode(fname), int(skiprows or 0), ctypes.byref(data_ptr), ctypes.byref(rows), ctypes.byref(cols), err, 256
    )
    if rc != 0:
        logging.debug("native loader failed for %s: %s", fname, err.value.decode())
        return None
    if rows.value == 0 or cols.value == 0:
        return np.empty((0, 0))
    try:
        buffer = np.ctypeslib.as_array(data_ptr, shape=(rows.value, cols.value))
        return np.array(buffer)  # owning copy
    finally:
        lib.gdt_free(data_ptr)
