"""Compile-time probe of 1D histogram formulations (single 1M row)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")

rng = np.random.RandomState(0)
N = 1_000_000
ix = jnp.asarray(rng.randint(0, 1024, N).astype(np.int32))
w = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))

def t(label, f, *a):
    t0 = time.perf_counter()
    out = f(*a)
    s = float(jnp.sum(out))
    print(f"{label}: {time.perf_counter()-t0:.1f}s sum={s}", flush=True)

def matvec_hist(block, dtype):
    @jax.jit
    def f(ixx, ww):
        nblk = N // block
        def bh(k):
            s = k * block
            sub = jax.lax.dynamic_slice(ixx, (s,), (block,))
            wb = jax.lax.dynamic_slice(ww, (s,), (block,)).astype(dtype)
            oh = jax.nn.one_hot(sub, 1024, dtype=dtype)
            return jax.lax.dot_general(wb[None, :], oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)[0]
        return jnp.sum(jax.lax.map(bh, jnp.arange(nblk)), axis=0)
    return f

def pair_hist(block):
    @jax.jit
    def f(ixx, ww):
        hi = ixx // 256
        lo = ixx % 256
        nblk = N // block
        def bh(k):
            s = k * block
            h = jax.lax.dynamic_slice(hi, (s,), (block,))
            l = jax.lax.dynamic_slice(lo, (s,), (block,))
            wb = jax.lax.dynamic_slice(ww, (s,), (block,)).astype(jnp.bfloat16)
            oh = jax.nn.one_hot(h, 4, dtype=jnp.bfloat16)
            ol = jax.nn.one_hot(l, 256, dtype=jnp.bfloat16) * wb[:, None]
            return jax.lax.dot_general(oh, ol, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return jnp.sum(jax.lax.map(bh, jnp.arange(nblk)), axis=0).reshape(-1)
    return f

t("pair-form hi/lo 4x256 blk65536", pair_hist(65536), ix, w)
t("matvec bf16 blk32768", matvec_hist(32768, jnp.bfloat16), ix, w)
t("matvec f32 blk32768", matvec_hist(32768, jnp.float32), ix, w)
print("done")
