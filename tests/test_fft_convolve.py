"""Parity tests for ops.fft and ops.convolve vs scipy/numpy and the
reference implementation's convolution engine."""

import numpy as np
import pytest
import scipy.fftpack as sfft

import jax.numpy as jnp

from getdist_tpu.ops import (
    autoConvolve,
    autoCorrelation,
    convolve1D,
    convolve1D_periodic,
    convolve2D,
    convolveFFT,
    convolveFFTn,
    convolveGaussian,
    convolveGaussianDCT,
    convolveGaussianTrunc,
    dct,
    dct2d,
    idct,
    idct2d,
    next_fast_len,
)

rng = np.random.RandomState(42)


def test_next_fast_len():
    for n in [1, 2, 3, 7, 11, 100, 255, 257, 1000, 1023, 1025, 4097]:
        m = next_fast_len(n)
        assert m >= n
        # verify 5-smooth
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        assert k == 1
        # not absurdly larger than scipy's choice
        assert m <= 2 * n


@pytest.mark.parametrize("n", [8, 15, 16, 64, 255, 1024])
def test_dct_matches_fftpack(n):
    x = rng.rand(n)
    np.testing.assert_allclose(np.asarray(dct(jnp.array(x))), sfft.dct(x, type=2), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(idct(jnp.array(x))), sfft.idct(x, type=2), rtol=1e-10, atol=1e-10)
    # round trip: idct(dct(x)) == 2N x (fftpack unnormalized convention)
    np.testing.assert_allclose(np.asarray(idct(dct(jnp.array(x)))) / (2 * n), x, rtol=1e-10, atol=1e-12)


def test_dct2d_matches_fftpack():
    a = rng.rand(32, 32)
    ref = sfft.dct(sfft.dct(a, axis=0), axis=1)
    np.testing.assert_allclose(np.asarray(dct2d(jnp.array(a))), ref, rtol=1e-9, atol=1e-9)
    ref_i = sfft.idct(sfft.idct(a, axis=1), axis=0)
    np.testing.assert_allclose(np.asarray(idct2d(jnp.array(a))), ref_i, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("mode", ["same", "full", "valid"])
@pytest.mark.parametrize("nx,ny", [(100, 31), (1024, 257), (57, 57)])
def test_convolve_fft_modes(mode, nx, ny):
    x = rng.rand(nx)
    y = rng.rand(ny)
    expected = np.convolve(x, y, mode)
    got = np.asarray(convolveFFT(jnp.array(x), jnp.array(y), mode))
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)
    got2 = np.asarray(convolve1D(jnp.array(x), jnp.array(y), mode))
    np.testing.assert_allclose(got2, expected, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("mode", ["same", "full", "valid"])
def test_convolve2d_matches_scipy(mode):
    from scipy.signal import convolve2d as sp_convolve2d

    x = rng.rand(64, 48)
    y = rng.rand(17, 9)
    expected = sp_convolve2d(x, y, mode)
    got = np.asarray(convolveFFTn(jnp.array(x), jnp.array(y), mode))
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


def test_convolve1d_periodic_parity(reference_getdist):
    from getdist import convolve as ref_conv

    x = rng.rand(129)
    x[-1] = x[0]  # duplicated boundary bin convention
    y = rng.rand(31)
    expected = ref_conv.convolve1D_periodic(x.copy(), y)
    got = np.asarray(convolve1D_periodic(jnp.array(x), jnp.array(y)))
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("px,py", [(True, True), (True, False), (False, True)])
def test_convolve2d_periodic_parity(reference_getdist, px, py):
    from getdist import convolve as ref_conv

    x = rng.rand(65, 65)
    y = rng.rand(15, 11)
    expected = ref_conv.convolve2D_periodic(x.copy(), y, periodic_x=px, periodic_y=py)
    got = np.asarray(convolve2D_periodic_wrap(jnp.array(x), jnp.array(y), px, py))
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


def convolve2D_periodic_wrap(x, y, px, py):
    from getdist_tpu.ops import convolve2D_periodic

    return convolve2D_periodic(x, y, periodic_x=px, periodic_y=py)


def test_convolve2d_mode_dispatch(reference_getdist):
    from getdist import convolve as ref_conv

    x = rng.rand(65, 65)
    y = rng.rand(15, 15)
    for mode in ["same", "periodic", "periodic_x", "periodic_y"]:
        expected = ref_conv.convolve2D(x.copy(), y, mode)
        got = np.asarray(convolve2D(jnp.array(x), jnp.array(y), mode))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9, err_msg=mode)


def test_autoconvolve_parity(reference_getdist):
    from getdist import convolve as ref_conv

    x = rng.rand(1000)
    for normalize in (True, False):
        expected = ref_conv.autoConvolve(x, n=200, normalize=normalize)
        got = np.asarray(autoConvolve(jnp.array(x), n=200, normalize=normalize))
        np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)
    expected = ref_conv.autoCorrelation(x, n=100)
    got = np.asarray(autoCorrelation(jnp.array(x), n=100))
    np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)


def test_gaussian_convolvers_parity(reference_getdist):
    from getdist import convolve as ref_conv

    x = rng.rand(300)
    for sigma in (2.0, 7.5):
        np.testing.assert_allclose(
            np.asarray(convolveGaussianDCT(jnp.array(x), sigma)),
            ref_conv.convolveGaussianDCT(x, sigma, cache={}),
            rtol=1e-8,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(convolveGaussian(jnp.array(x), sigma)),
            ref_conv.convolveGaussian(x, sigma),
            rtol=1e-8,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(convolveGaussianTrunc(jnp.array(x), sigma)),
            ref_conv.convolveGaussianTrunc(x, sigma),
            rtol=1e-8,
            atol=1e-10,
        )
