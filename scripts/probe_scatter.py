"""Isolate why 65536-bin scatter is slow; find a fast 2D histogram lowering."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 1_000_000
rng = np.random.RandomState(0)
w = jnp.asarray(rng.randint(1, 4, N).astype(np.float32))
ix256a = jnp.asarray(rng.randint(0, 256, N).astype(np.int32))
ix256b = jnp.asarray(rng.randint(0, 256, N).astype(np.int32))
flat = ix256a * 256 + ix256b
flat_sorted = jnp.sort(flat)

def timeit(label, fn, *args, n=3):
    try:
        out = fn(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n): out = fn(*args)
        jax.block_until_ready(out)
        print(label, (time.perf_counter()-t0)/n)
    except Exception as e:
        print(label, "FAILED", repr(e)[:120])

timeit("scatter 1M->1024       ", jax.jit(lambda i, ww: jnp.zeros(1024, jnp.float32).at[i % 1024].add(ww)), flat, w)
timeit("scatter 1M->4096       ", jax.jit(lambda i, ww: jnp.zeros(4096, jnp.float32).at[i % 4096].add(ww)), flat, w)
timeit("scatter 1M->16384      ", jax.jit(lambda i, ww: jnp.zeros(16384, jnp.float32).at[i % 16384].add(ww)), flat, w)
timeit("scatter 1M->65536      ", jax.jit(lambda i, ww: jnp.zeros(65536, jnp.float32).at[i].add(ww)), flat, w)
timeit("scatter sorted->65536  ", jax.jit(lambda i, ww: jnp.zeros(65536, jnp.float32).at[i].add(ww)), flat_sorted, w)
timeit("segsum 1M->65536       ", jax.jit(lambda i, ww: jax.ops.segment_sum(ww, i, 65536)), flat, w)
timeit("scatter2d (iy,ix)      ", jax.jit(lambda a, b, ww: jnp.zeros((256,256), jnp.float32).at[a, b].add(ww)), ix256a, ix256b, w)
# decompose: 256 x (mask + 1024-bin scatter)? try row-partitioned: for each of 16 groups of a-bins, masked scatter into (16*256)
@jax.jit
def grouped(a, b, ww):
    # scatter into 16 chunks of 4096 bins each using where-masking
    out = []
    for g in range(16):
        sel = (a // 16) == g
        sub = (a % 16) * 256 + b
        out.append(jnp.zeros(4096, jnp.float32).at[jnp.where(sel, sub, 4095)].add(jnp.where(sel, ww, 0.0)))
    return jnp.stack(out)
timeit("grouped 16x4096        ", grouped, ix256a, ix256b, w)
# one-hot matmul single pair, bf16
@jax.jit
def onehot_pair(a, b, ww):
    B = 131072
    def body(c, k):
        s = k * B
        aa = jax.lax.dynamic_slice(a, (s,), (B,))
        bb = jax.lax.dynamic_slice(b, (s,), (B,))
        wb = jax.lax.dynamic_slice(ww, (s,), (B,))
        oa = (jax.nn.one_hot(aa, 256, dtype=jnp.bfloat16) * wb[:, None].astype(jnp.bfloat16))
        ob = jax.nn.one_hot(bb, 256, dtype=jnp.bfloat16)
        return c + jax.lax.dot_general(oa, ob, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32), 0
    h, _ = jax.lax.scan(body, jnp.zeros((256, 256), jnp.float32), jnp.arange(N // B))
    return h
timeit("onehot matmul 1 pair   ", onehot_pair, ix256a, ix256b, w)
# 1D scatter again (verify first probe wasn't bogus): per-call fresh output
timeit("scatter 1M->1024 x30   ", jax.jit(lambda i, ww: jax.vmap(lambda off: jnp.zeros(1024, jnp.float32).at[(i + off) % 1024].add(ww))(jnp.arange(30))), flat, w)
print("done")
