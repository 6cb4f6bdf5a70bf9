"""Probe: can the parity pipeline's exactness-critical pieces ride the TPU?

Questions (VERDICT round-3 item 3 -- a --parity-tpu mode):
 1. Does the axon TPU backend run float64 (x64) elementwise math at all,
    and at what cost for the O(N) stages (bin-index computation)?
 2. Do device-computed f64 bin indices match host numpy bit-for-bit?
 3. What does an exact integer pair histogram cost at generic fine sizes
    (one-hot matmul, int32 accumulation)?
 4. What do the f32 grid-local convolution programs cost at parity shapes?

Run with JAX_PLATFORMS unset (TPU via the axon tunnel).
"""

import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

dev = jax.devices()[0]
print("device:", dev, "platform:", dev.platform)

rng = np.random.RandomState(3)
N = 1_000_000
P = 30

samples = np.cumsum(rng.standard_normal((N, P)), axis=0) * 0.01 + rng.standard_normal((N, P))
weights = rng.randint(1, 5, N).astype(np.float64)

# --- 1+2: f64 elementwise on device, bin-index parity --------------------
lo = samples.min(axis=0) - 0.05
hi = samples.max(axis=0) + 0.05
fine = 256
width = (hi - lo) / (fine - 1)

host_ix = ((samples - lo[None, :]) / width[None, :] + 0.5).astype(np.int64)

try:
    d_samples = jnp.asarray(samples)  # f64
    print("f64 transfer ok, dtype on device:", d_samples.dtype)

    @jax.jit
    def bin_ix_f64(s, lo_, w_):
        return ((s - lo_[None, :]) / w_[None, :] + 0.5).astype(jnp.int32)

    t0 = time.perf_counter()
    dev_ix = bin_ix_f64(d_samples, jnp.asarray(lo), jnp.asarray(width))
    dev_ix.block_until_ready()
    t1 = time.perf_counter()
    dev_ix2 = bin_ix_f64(d_samples, jnp.asarray(lo), jnp.asarray(width))
    dev_ix2.block_until_ready()
    t2 = time.perf_counter()
    mismatch = int(np.sum(np.asarray(dev_ix) != host_ix))
    print(f"f64 bin indices: cold {t1 - t0:.3f}s warm {t2 - t1:.3f}s mismatches {mismatch}/{N * P}")
except Exception as e:  # noqa: BLE001
    print("f64 on device FAILED:", repr(e))

# f32 comparison: how many index flips does plain f32 cause?
try:

    @jax.jit
    def bin_ix_f32(s, lo_, w_):
        return ((s - lo_[None, :]) / w_[None, :] + 0.5).astype(jnp.int32)

    s32 = jnp.asarray(samples.astype(np.float32))
    t0 = time.perf_counter()
    ix32 = bin_ix_f32(s32, jnp.asarray(lo.astype(np.float32)), jnp.asarray(width.astype(np.float32)))
    ix32.block_until_ready()
    t1 = time.perf_counter()
    ix32b = bin_ix_f32(s32, jnp.asarray(lo.astype(np.float32)), jnp.asarray(width.astype(np.float32)))
    ix32b.block_until_ready()
    t2 = time.perf_counter()
    flips = int(np.sum(np.asarray(ix32) != host_ix))
    print(f"f32 bin indices: cold {t1 - t0:.3f}s warm {t2 - t1:.3f}s flips vs f64 host {flips}/{N * P}")
except Exception as e:  # noqa: BLE001
    print("f32 binning failed:", repr(e))

# --- 3: exact one-hot pair hist at fine=384 (stretched group) ------------
try:
    fine_s = 384
    K = 32  # pairs in a stretched group

    @jax.jit
    def pair_hists_onehot(ix_a, ix_b, w):
        # (K, N) indices; one-hot f32 matmul with f32 accumulation is exact
        # for integer-weighted counts < 2^24
        oh_a = jax.nn.one_hot(ix_a, fine_s, dtype=jnp.float32) * w[None, :, None]
        oh_b = jax.nn.one_hot(ix_b, fine_s, dtype=jnp.float32)
        return jnp.einsum("knf,kng->kfg", oh_b, oh_a, precision=jax.lax.Precision.HIGHEST)

    ia = jnp.asarray(np.tile(host_ix[:, 0], (K, 1)).astype(np.int32) % fine_s)
    ib = jnp.asarray(np.tile(host_ix[:, 1], (K, 1)).astype(np.int32) % fine_s)
    w32 = jnp.asarray(weights.astype(np.float32))
    t0 = time.perf_counter()
    hh = pair_hists_onehot(ia, ib, w32)
    hh.block_until_ready()
    t1 = time.perf_counter()
    hh = pair_hists_onehot(ia, ib, w32)
    hh.block_until_ready()
    t2 = time.perf_counter()
    ref = np.bincount(
        (host_ix[:, 1] % fine_s) * fine_s + (host_ix[:, 0] % fine_s), weights=weights, minlength=fine_s * fine_s
    ).reshape(fine_s, fine_s)
    err = float(np.abs(np.asarray(hh[0], np.float64) - ref).max())
    print(f"one-hot hist fine={fine_s} K={K}: cold {t1 - t0:.3f}s warm {t2 - t1:.3f}s max|err| {err}")
except Exception as e:  # noqa: BLE001
    print("one-hot hist failed:", repr(e))

# --- 4: f32 'same' convolution at parity shapes ---------------------------
try:
    from getdist_tpu.ops.dft_conv import conv2d_same_dft  # noqa: F401

    have_dft = True
except Exception:  # noqa: BLE001
    have_dft = False
print("dft_conv available:", have_dft)
