"""Probe 2 for --parity-tpu: tunnel throughput + readback-synced timings.

block_until_ready is unreliable through the axon tunnel, so every timing
below is synced by a host readback of data depending on the full result.
"""

import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

rng = np.random.RandomState(3)
N = 1_000_000
P = 30

print("backend:", jax.default_backend())

# --- tunnel throughput -----------------------------------------------------
h2d = np.ascontiguousarray(rng.standard_normal((N, P)))  # 240 MB f64
t0 = time.perf_counter()
d = jnp.asarray(h2d)
_ = float(d[0, 0])
t1 = time.perf_counter()
print(f"h2d 240MB f64: {t1 - t0:.2f}s ({240 / (t1 - t0):.0f} MB/s)")

big = jnp.zeros((435, 256, 256), jnp.float32) + d[0, 0]  # 114 MB on device
_ = float(big[0, 0, 0])
t0 = time.perf_counter()
back = np.asarray(big)
t1 = time.perf_counter()
print(f"d2h 114MB f32: {t1 - t0:.2f}s ({114 / (t1 - t0):.0f} MB/s)")

# --- warm timings with readback sync --------------------------------------
samples = h2d
weights = rng.randint(1, 5, N).astype(np.float64)
lo = samples.min(axis=0) - 0.05
hi = samples.max(axis=0) + 0.05
fine = 256
width = (hi - lo) / (fine - 1)
d_s = d
d_lo, d_w = jnp.asarray(lo), jnp.asarray(width)


@jax.jit
def bin_ix(s, lo_, w_):
    return ((s - lo_[None, :]) / w_[None, :] + 0.5).astype(jnp.int32).T  # (P, N)


ix = bin_ix(d_s, d_lo, d_w)
_ = int(ix[0, 0])
for _ in range(2):
    t0 = time.perf_counter()
    ix = bin_ix(d_s, d_lo, d_w)
    s = int(jnp.sum(ix[:, -1]))
    t1 = time.perf_counter()
print(f"f64 bin indices 30x1M (readback-synced): {t1 - t0:.3f}s")

# one-hot pair hists at fine=256, K=64 group via einsum (XLA, not Pallas)
w32 = jnp.asarray(weights.astype(np.float32))
pairs = np.array([(i, (i + 1) % P) for i in range(P)] + [(i, (i + 7) % P) for i in range(P)] + [(0, 9), (1, 8), (2, 7), (3, 6)], np.int32)[:64]
pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])


@jax.jit
def hists_onehot(ix_, w_, pa_, pb_):
    oh_a = jax.nn.one_hot(ix_[pa_], 256, dtype=jnp.float32) * w_[None, :, None]
    oh_b = jax.nn.one_hot(ix_[pb_], 256, dtype=jnp.float32)
    return jnp.einsum("knf,kng->kfg", oh_b, oh_a, precision=jax.lax.Precision.HIGHEST)


hh = hists_onehot(ix, w32, pa, pb)
_ = float(hh[0, 0, 0])
for _ in range(2):
    t0 = time.perf_counter()
    hh = hists_onehot(ix, w32, pa, pb)
    s = float(jnp.sum(hh[:, -1, -1]))
    t1 = time.perf_counter()
print(f"one-hot hists K=64 fine=256 (XLA einsum, synced): {t1 - t0:.3f}s")

# f64 exp + f64 dot (for exact-ish N_eff lag terms)
col = d_s[:, 0]
w64 = jnp.asarray(weights)


@jax.jit
def lag_terms_f64(dcol, w_, lags):
    def one(k):
        sh = jnp.roll(dcol, -k)
        msk = (jnp.arange(N) < N - k).astype(jnp.float64)
        step = sh - dcol
        return jnp.sum(jnp.exp(step * step * (-0.25)) * w_ * jnp.roll(w_, -k) * msk)

    return jax.vmap(one)(lags)


lags = jnp.arange(1, 65)
lt = lag_terms_f64(col, w64, lags)
_ = float(lt[0])
for _ in range(2):
    t0 = time.perf_counter()
    lt = lag_terms_f64(col, w64, lags)
    s = float(jnp.sum(lt))
    t1 = time.perf_counter()
print(f"f64 lag terms 64 lags x 1M (exp, synced): {t1 - t0:.3f}s")

# host reference for one lag term
host_col = samples[:, 0]
k = 1
step = host_col[k:] - host_col[:-k]
ref = float(np.dot(np.exp(step * step * -0.25), weights[k:] * weights[:-k]))
got = float(lt[0])
print(f"lag-1 term: host {ref!r} device {got!r} rel {abs(got - ref) / ref:.2e}")
