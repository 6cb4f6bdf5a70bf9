#!/usr/bin/env python
"""Probe: the fused pipeline's convolution tail, XLA rfft vs the Pallas
DFT-matmul kernel (ops/dft_conv.py), at production geometry on the chip.

Production tail = per fused 2D stage: one main smoothing conv of
(435, 256, 256) grids, one mult-bias edge-mask conv of (435, 316, 316)
masks, and one mult-bias round conv of (435, 256, 256) — all against the
same per-pair (61, 61) kernels.  The kernel spectrum is computed once.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from getdist_tpu.ops.dft_conv import DEFAULT_PAD, dft_conv2d, dft_conv_spectrum

K, N, W = 435, 256, 30
M = 2 * W + 1
EXT = N + 2 * W
PAD_FFT = 320
PAD_EXT_FFT = 384


def timed(fn, label, repeats=5):
    out = fn()
    _ = float(jnp.sum(out[-1] if isinstance(out, (tuple, list)) else out))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        _ = float(jnp.sum(out[-1] if isinstance(out, (tuple, list)) else out))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1000:.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    hists = jnp.asarray(rng.rand(K, N, N).astype(np.float32) * 40.0)
    masks = jnp.asarray(rng.rand(K, EXT, EXT).astype(np.float32))
    kernels = jnp.asarray(rng.rand(K, M, M).astype(np.float32))
    kernels = kernels / jnp.sum(kernels, axis=(1, 2), keepdims=True)

    @jax.jit
    def tail_fft(h, mk, kn):
        kf = jnp.fft.rfftn(kn, (PAD_FFT, PAD_FFT), axes=(1, 2))
        gf = jnp.fft.rfftn(h, (PAD_FFT, PAD_FFT), axes=(1, 2))
        main = jax.lax.dynamic_slice(
            jnp.fft.irfftn(gf * kf, (PAD_FFT, PAD_FFT), axes=(1, 2)), (0, W, W), (K, N, N)
        )
        mf = jnp.fft.rfftn(mk, (PAD_EXT_FFT, PAD_EXT_FFT), axes=(1, 2))
        kf2 = jnp.fft.rfftn(kn, (PAD_EXT_FFT, PAD_EXT_FFT), axes=(1, 2))
        a00 = jax.lax.dynamic_slice(
            jnp.fft.irfftn(mf * kf2, (PAD_EXT_FFT, PAD_EXT_FFT), axes=(1, 2)), (0, 2 * W, 2 * W), (K, N, N)
        )
        rf = jnp.fft.rfftn(main / jnp.maximum(a00, 1e-6), (PAD_FFT, PAD_FFT), axes=(1, 2))
        rnd = jax.lax.dynamic_slice(
            jnp.fft.irfftn(rf * kf, (PAD_FFT, PAD_FFT), axes=(1, 2)), (0, W, W), (K, N, N)
        )
        return main, a00, rnd

    timed(lambda: tail_fft(hists, masks, kernels), "XLA rfft tail (3 convs; WRONG at batch 435 — see probe_xla_fft_batch)")

    # accuracy reference: same FFT tail in batch chunks of 64 — far below
    # the XLA irfftn batch cliff at BOTH frame sizes (the cliff moves with
    # size: >=385 at 320^2, between 179 and 256 at 384^2)
    @jax.jit
    def tail_fft_chunked(h, mk, kn):
        parts = []
        for lo in range(0, K, 64):
            sl = slice(lo, min(lo + 64, K))
            kk = kn[sl]
            kf = jnp.fft.rfftn(kk, (PAD_FFT, PAD_FFT), axes=(1, 2))
            gf = jnp.fft.rfftn(h[sl], (PAD_FFT, PAD_FFT), axes=(1, 2))
            nb = kk.shape[0]
            main = jax.lax.dynamic_slice(
                jnp.fft.irfftn(gf * kf, (PAD_FFT, PAD_FFT), axes=(1, 2)), (0, W, W), (nb, N, N)
            )
            mf = jnp.fft.rfftn(mk[sl], (PAD_EXT_FFT, PAD_EXT_FFT), axes=(1, 2))
            kf2 = jnp.fft.rfftn(kk, (PAD_EXT_FFT, PAD_EXT_FFT), axes=(1, 2))
            a00 = jax.lax.dynamic_slice(
                jnp.fft.irfftn(mf * kf2, (PAD_EXT_FFT, PAD_EXT_FFT), axes=(1, 2)), (0, 2 * W, 2 * W), (nb, N, N)
            )
            rf = jnp.fft.rfftn(main / jnp.maximum(a00, 1e-6), (PAD_FFT, PAD_FFT), axes=(1, 2))
            rnd = jax.lax.dynamic_slice(
                jnp.fft.irfftn(rf * kf, (PAD_FFT, PAD_FFT), axes=(1, 2)), (0, W, W), (nb, N, N)
            )
            parts.append((main, a00, rnd))
        return tuple(jnp.concatenate([p[i] for p in parts]) for i in range(3))

    ref = timed(lambda: tail_fft_chunked(hists, masks, kernels), "XLA rfft tail, chunks of 64 (correct)")

    for prec in ("highest", "split3", "default"):  # Mosaic rejects HIGH; split3 emulates it

        @jax.jit
        def tail_dft(h, mk, kn, prec=prec):
            ur, ui = dft_conv_spectrum(kn, pad=DEFAULT_PAD, precision=prec)
            main = dft_conv2d(h, ur, ui, N, W, pad=DEFAULT_PAD, precision=prec)
            a00 = dft_conv2d(mk, ur, ui, N, 2 * W, pad=DEFAULT_PAD, precision=prec)
            rnd = dft_conv2d(main / jnp.maximum(a00, 1e-6), ur, ui, N, W, pad=DEFAULT_PAD, precision=prec)
            return main, a00, rnd

        got = timed(lambda f=tail_dft: f(hists, masks, kernels), f"Pallas DFT tail ({prec})")
        for name, a, b in zip(("main", "a00", "round"), ref, got):
            scale = float(jnp.max(jnp.abs(a)))
            err = float(jnp.max(jnp.abs(a - b))) / scale
            print(f"  {prec} {name}: max rel-to-peak delta {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
