"""Reliable timing on the axon TPU: force host readback of a scalar
(block_until_ready appears not to block on this experimental platform).
Calibrate with a known-FLOP matmul first."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 1_000_000
rng = np.random.RandomState(0)
w = jnp.asarray(rng.randint(1, 4, N).astype(np.float32))
ix_a = jnp.asarray(rng.randint(0, 256, N).astype(np.int32))
ix_b = jnp.asarray(rng.randint(0, 256, N).astype(np.int32))

def timeit(label, fn, *args, n=3):
    try:
        float(jnp.sum(fn(*args)))  # compile + settle
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n):
            acc += float(jnp.sum(fn(*args)))  # forces full execution + readback
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1000:.2f} ms")
    except Exception as e:
        print(label, "FAILED", repr(e)[:150])

# calibration: 8192^3 matmul f32 = 1.1 TFLOP -> expect >= ~12 ms on v5e f32
A = jnp.asarray(rng.rand(8192, 8192).astype(np.float32))
timeit("calib matmul 8192^3 f32 (1.1 TFLOP)", jax.jit(lambda a: a @ a), A)
B = A.astype(jnp.bfloat16)
timeit("calib matmul 8192^3 bf16", jax.jit(lambda a: (a @ a)), B)

timeit("scatter 1M->65536 x1", jax.jit(lambda a, b, ww: jnp.zeros(65536, jnp.float32).at[a*256+b].add(ww)), ix_a, ix_b, w)

@jax.jit
def scatter8(a, b, ww):
    # 8 pairs sequentially via different fake index perms
    outs = []
    for k in range(8):
        outs.append(jnp.zeros(65536, jnp.float32).at[(a + k) % 256 * 256 + b].add(ww))
    return jnp.stack(outs)
timeit("scatter 1M->65536 x8 (unrolled)", scatter8, ix_a, ix_b, w)

@jax.jit
def scatter8_vmap(a, b, ww):
    def one(k):
        return jnp.zeros(65536, jnp.float32).at[(a + k) % 256 * 256 + b].add(ww)
    return jax.vmap(one)(jnp.arange(8))
timeit("scatter 1M->65536 x8 (vmap)", scatter8_vmap, ix_a, ix_b, w)

@jax.jit
def scatter8_scan(a, b, ww):
    def one(carry, k):
        return carry, jnp.zeros(65536, jnp.float32).at[(a + k) % 256 * 256 + b].add(ww)
    _, out = jax.lax.scan(one, 0, jnp.arange(8))
    return out
timeit("scatter 1M->65536 x8 (scan)", scatter8_scan, ix_a, ix_b, w)

timeit("sort 1M x4 cols", jax.jit(lambda s: jnp.sort(s, axis=0)), jnp.asarray(rng.rand(N, 4).astype(np.float32)))

g = jnp.asarray(rng.rand(32, 320, 320).astype(np.float32))
timeit("rfft2+irfft2 32x320^2", jax.jit(lambda x: jnp.fft.irfftn(jnp.fft.rfftn(x, axes=(1,2)), axes=(1,2))), g)

# Toeplitz-matmul convolution: T_u @ X @ T_v^T for 32 pairs, f32
T = jnp.asarray(rng.rand(32, 256, 256).astype(np.float32))
X = jnp.asarray(rng.rand(32, 256, 256).astype(np.float32))
timeit("T@X@T' 32 pairs f32 (2x256^3 x32=1.1GFLOPx2)", jax.jit(lambda t, x: jnp.einsum('kij,kjl,kml->kim', t, x, t)), T, X)
print("done")
