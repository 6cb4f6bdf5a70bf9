#!/usr/bin/env python
"""Probe: batched 2D 'same' convolution via XLA rfft vs DFT-matmul (MXU).

The fused pipeline's tail is dominated by (435, 320, 320) FFT convolutions
(~43 ms each on v5e; ~20x a bandwidth-bound estimate — XLA's TPU FFT is
slow). A DFT expressed as matrix multiplication runs on the MXU instead:
conv = real(Finv @ ((F @ H @ F^T) * KF) @ Finv^T). This probe measures both
on the real chip at the production shape.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

K, N, W = 435, 256, 30
PAD = 320  # next_fast_len(256 + 2*30)


def timed(fn, *args, repeats=5, label=""):
    out = fn(*args)
    _ = float(jnp.sum(out))  # forced readback (tunnel-safe sync)
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[-1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1000:.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    grids = jnp.asarray(rng.rand(K, N, N).astype(np.float32))
    kernels = jnp.asarray(rng.rand(K, 2 * W + 1, 2 * W + 1).astype(np.float32))

    # --- XLA FFT baseline (the current _conv2d_same_kf) -----------------
    @jax.jit
    def conv_fft(g, k):
        kf = jnp.fft.rfftn(k, (PAD, PAD), axes=(1, 2))
        gf = jnp.fft.rfftn(g, (PAD, PAD), axes=(1, 2))
        full = jnp.fft.irfftn(gf * kf, (PAD, PAD), axes=(1, 2))
        return jax.lax.dynamic_slice(full, (0, W, W), (K, N, N))

    # --- DFT-matmul -----------------------------------------------------
    # F: (PAD, PAD) DFT matrix, split into real/imag f32 for MXU matmuls
    idx = np.arange(PAD)
    ang = -2 * np.pi * np.outer(idx, idx) / PAD
    FR = jnp.asarray(np.cos(ang).astype(np.float32))
    FI = jnp.asarray(np.sin(ang).astype(np.float32))
    IR = jnp.asarray((np.cos(ang).T / PAD).astype(np.float32))
    II = jnp.asarray((-np.sin(ang).T / PAD).astype(np.float32))

    def dft2(hr, hi, mr, mi):
        # (A + iB) @ (H_r + iH_i) @ (A + iB)^T, A/B shared left/right
        t_r = jnp.einsum("kyx,xu->kyu", hr, mr) - jnp.einsum("kyx,xu->kyu", hi, mi)
        t_i = jnp.einsum("kyx,xu->kyu", hr, mi) + jnp.einsum("kyx,xu->kyu", hi, mr)
        o_r = jnp.einsum("vy,kyu->kvu", mr, t_r) - jnp.einsum("vy,kyu->kvu", mi, t_i)
        o_i = jnp.einsum("vy,kyu->kvu", mr, t_i) + jnp.einsum("vy,kyu->kvu", mi, t_r)
        return o_r, o_i

    def conv_dft(g, k, precision):
        with jax.default_matmul_precision(precision):
            gp = jnp.pad(g, ((0, 0), (0, PAD - N), (0, PAD - N)))
            kp = jnp.pad(k, ((0, 0), (0, PAD - 2 * W - 1), (0, PAD - 2 * W - 1)))
            gr, gi = dft2(gp, jnp.zeros_like(gp), FR, FI)
            kr, ki = dft2(kp, jnp.zeros_like(kp), FR, FI)
            pr = gr * kr - gi * ki
            pi = gr * ki + gi * kr
            orr, _ = dft2(pr, pi, IR * PAD, II * PAD)  # unnormalized inverse pieces
            out = orr / PAD  # IR already carries 1/PAD once; total 1/PAD^2
            return jax.lax.dynamic_slice(out, (0, W, W), (K, N, N))

    conv_dft_hi = jax.jit(lambda g, k: conv_dft(g, k, "float32"))
    conv_dft_bf = jax.jit(lambda g, k: conv_dft(g, k, "BF16_BF16_F32_X3"))

    ref = timed(conv_fft, grids, kernels, label="xla rfft conv")
    hi = timed(conv_dft_hi, grids, kernels, label="dft-matmul f32")
    bf = timed(conv_dft_bf, grids, kernels, label="dft-matmul bf16x3")
    for name, cand in (("f32", hi), ("bf16x3", bf)):
        err = float(jnp.max(jnp.abs(cand - ref))) / float(jnp.max(jnp.abs(ref)))
        print(f"max rel err {name}: {err:.2e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
