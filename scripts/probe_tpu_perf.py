"""Measure candidate kernel strategies for the all-pairs KDE benchmark on
the real TPU chip: scatter-add histograms vs one-hot MXU matmuls, sorts,
FFT convolution batches. Informs the design of ops/batched.py."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 1_000_000
P = 30
NPAIR = 435

rng = np.random.RandomState(0)
samples = jnp.asarray(rng.standard_normal((N, P)).astype(np.float32))
weights = jnp.asarray(rng.randint(1, 4, N).astype(np.float32))
ix1d = jnp.asarray(rng.randint(0, 1024, (P, N)).astype(np.int32))
ix2d8 = jnp.asarray(rng.randint(0, 256, (P, N)).astype(np.int32))

def timeit(fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

# 1) scatter-add 1D: all 30 params
@jax.jit
def hist1d_scatter(ix, w):
    def one(ixp):
        return jnp.zeros(1024, jnp.float32).at[ixp].add(w)
    return jax.vmap(one)(ix)
print("hist1d_scatter (30x1M->1024):", timeit(hist1d_scatter, ix1d, weights))

# 2) scatter-add 2D for 435 pairs via flat indices
pairs = np.array([(i, j) for i in range(P) for j in range(i+1, P)], np.int32)
pa = jnp.asarray(pairs[:, 0]); pb = jnp.asarray(pairs[:, 1])
@jax.jit
def hist2d_scatter(ix8, w):
    def one(a, b):
        flat = ix8[a] * 256 + ix8[b]
        return jnp.zeros(65536, jnp.float32).at[flat].add(w)
    return jax.vmap(one)(pa, pb)
try:
    t = timeit(hist2d_scatter, ix2d8, weights, n=2)
    print("hist2d_scatter (435x1M->256^2):", t)
except Exception as e:
    print("hist2d_scatter failed:", e)

# 3) one-hot matmul 2D for a block of pairs
@jax.jit
def hist2d_matmul(ix8, w):
    # blockwise over samples; one-hot bf16, MXU contraction per pair
    B = 65536
    nblk = N // B
    def body(carry, blk):
        s = blk * B
        oh = jax.nn.one_hot(jax.lax.dynamic_slice(ix8, (0, s), (P, B)), 256, dtype=jnp.bfloat16)  # (P,B,256)
        wblk = jax.lax.dynamic_slice(w, (s,), (B,)).astype(jnp.bfloat16)
        ya = oh[pa] * wblk[None, :, None]
        yb = oh[pb]
        h = jnp.einsum('kbi,kbj->kij', ya, yb, preferred_element_type=jnp.float32)
        return carry + h, 0
    init = jnp.zeros((NPAIR, 256, 256), jnp.float32)
    out, _ = jax.lax.scan(body, init, jnp.arange(nblk))
    return out
try:
    t = timeit(hist2d_matmul, ix2d8, weights, n=1)
    print("hist2d_matmul (435x1M->256^2):", t)
except Exception as e:
    print("hist2d_matmul failed:", repr(e)[:200])

# 4) sort all params (for quantiles)
@jax.jit
def sort_all(s):
    return jnp.sort(s, axis=0)
print("sort 1M x 30:", timeit(sort_all, samples, n=3))

# 5) batched 2D FFT convolution: 435 grids 256^2 kernel 61^2 -> pad 320
@jax.jit
def conv_batch(h):
    k = jnp.ones((61, 61), jnp.float32)
    H = jnp.fft.rfftn(h, (320, 320), axes=(1, 2))
    K = jnp.fft.rfftn(k, (320, 320))
    return jnp.fft.irfftn(H * K, (320, 320), axes=(1, 2))[:, :256, :256]
grids = jnp.asarray(rng.rand(NPAIR, 256, 256).astype(np.float32))
print("conv_batch 435x256^2 (pad320):", timeit(conv_batch, grids, n=3))

# 6) lag-scan N_eff style: 64 lags x 30 params
@jax.jit
def lag_scan(s, w):
    d = s.T  # (P, N)
    ks = jnp.asarray(np.unique(np.geomspace(1, 5000, 48).astype(np.int32)))
    def one_lag(k):
        ds = jnp.roll(d, -k, axis=1)
        ws = jnp.roll(w, -k)
        valid = (jnp.arange(N) < N - k)[None, :]
        return jnp.sum(jnp.where(valid, jnp.exp(-(d - ds)**2 * 25.0) * w[None] * ws[None], 0), axis=1)
    return jax.lax.map(one_lag, ks)
print("lag_scan 46 lags x 30 params:", timeit(lag_scan, samples, weights, n=3))
print("done")
