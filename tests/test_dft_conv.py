"""DFT-matmul convolution kernel vs the rFFT path (element-wise parity).

The Pallas kernel runs in interpret mode here (CPU CI); the real-chip
timing lives in scripts/probe_dft_pallas.py and docs/performance.md.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from getdist_tpu.ops.batched import _conv2d_same_batch, _gauss_kernel_2d
from getdist_tpu.ops.dft_conv import DEFAULT_PAD, dft_conv2d, dft_conv2d_ref, dft_conv_spectrum


def _fixtures(k=3, n=64, m=21, seed=0):
    rng = np.random.RandomState(seed)
    grids = jnp.asarray(rng.rand(k, n, n).astype(np.float32) * 50.0)
    kernels = jnp.stack(
        [
            _gauss_kernel_2d(
                jnp.float32(1.5 + i), jnp.float32(2.0 + 0.5 * i), jnp.float32(0.3 * i - 0.2), (m - 1) // 2, jnp.float32
            )
            for i in range(k)
        ]
    )
    return grids, kernels


def test_ref_impl_matches_rfft_same():
    grids, kernels = _fixtures()
    m = kernels.shape[-1]
    want = _conv2d_same_batch(grids, kernels, 128)
    got = dft_conv2d_ref(grids, kernels, grids.shape[-1], (m - 1) // 2, pad=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=5e-5 * float(jnp.max(want)))


@pytest.mark.parametrize("offset_mode", ["same", "ext"])
def test_pallas_kernel_matches_rfft(offset_mode):
    k, n, m = 2, 48, 13
    half = (m - 1) // 2
    rng = np.random.RandomState(1)
    kernels = jnp.asarray(rng.rand(k, m, m).astype(np.float32))
    if offset_mode == "same":
        grids = jnp.asarray(rng.rand(k, n, n).astype(np.float32) * 20.0)
        out_size, offset = n, half
        want = _conv2d_same_batch(grids, kernels, 128)
    else:
        # the reference's padded-extension variant: input n + 2*half wide,
        # output sliced at offset 2*half (ops/batched.py mask convolutions)
        ext = n + 2 * half
        grids = jnp.asarray(rng.rand(k, ext, ext).astype(np.float32) * 20.0)
        out_size, offset = n, 2 * half
        full = _conv2d_same_batch(jnp.pad(grids, ((0, 0), (0, 128 - ext), (0, 128 - ext))), kernels, 160)
        want = full[:, half + offset - half : half + offset - half + n, :][:, :, half : half + n]
        # _conv2d_same_batch slices at half already: full[offset:offset+n] == same-result[offset-half: ...]
        want = _conv2d_same_batch(grids, kernels, 160)[:, offset - half : offset - half + n, offset - half : offset - half + n]
    ur, ui = dft_conv_spectrum(kernels, pad=128, interpret=True)
    got = dft_conv2d(grids, ur, ui, out_size, offset, pad=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-4 * float(jnp.max(jnp.abs(want))))


def test_pallas_kernel_production_frame_small_batch():
    """Exact production geometry (fine=256, winw=30, pad=384), tiny batch."""
    k = 2
    grids, _ = _fixtures(k=k, n=256, m=61, seed=2)
    _, kernels = _fixtures(k=k, n=8, m=61, seed=3)
    want = _conv2d_same_batch(grids, kernels, 320)
    ur, ui = dft_conv_spectrum(kernels, pad=DEFAULT_PAD, interpret=True)
    got = dft_conv2d(grids, ur, ui, 256, 30, pad=DEFAULT_PAD, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-4 * float(jnp.max(jnp.abs(want))))


@pytest.mark.parametrize("pad,n,m", [(512, 256, 137), (640, 256, 265)])
def test_xla_twin_oversized_pads(pad, n, m):
    """The plain-XLA einsum twins serve the parity-mode frames the Pallas
    kernel's Mosaic toolchain refuses (>384): 'same' convolution parity
    against the rFFT path at winw=34 and winw=66 geometries."""
    from getdist_tpu.ops.dft_conv import dft_conv2d_xla, dft_conv_spectrum_xla

    half = (m - 1) // 2
    grids, _ = _fixtures(k=2, n=n, m=m, seed=4)
    rng = np.random.RandomState(5)
    kernels = jnp.asarray(rng.rand(2, m, m).astype(np.float32))
    want = _conv2d_same_batch(grids, kernels, pad)
    ur, ui = dft_conv_spectrum_xla(kernels, pad=pad)
    got = dft_conv2d_xla(grids, ur, ui, n, half, pad=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-4 * float(jnp.max(jnp.abs(want))))
