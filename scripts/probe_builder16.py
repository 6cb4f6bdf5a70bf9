"""Compare original vs hi/lo-factored one-hot builder kernels."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
import scripts.probe_kernel_v6c as V

rng = np.random.RandomState(0)
NC = 1 << 19
ix = jnp.asarray(rng.randint(0, 256, (30, NC)).astype(np.uint8))
wj = jnp.asarray(rng.randint(1, 5, NC).astype(np.float32))

def _builder16(block, n_params):
    def kernel(ix_ref, w_ref, out_ref):
        hi_lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 16), 1)
        wcol = w_ref[:, 0].astype(jnp.bfloat16)[:, None]
        for p in range(n_params):
            col = ix_ref[p].astype(jnp.int32)[:, None]
            hi = (jax.lax.shift_right_logical(col, 4) == hi_lanes).astype(jnp.bfloat16)
            lo = ((col & 15) == hi_lanes).astype(jnp.bfloat16) * wcol
            W = pltpu.repeat(hi, 16, axis=1) * jnp.concatenate([lo] * 16, axis=1)
            out_ref[p // 6, p % 6] = W.astype(jnp.int8)
    return kernel

def make_build(kernel_fn, bb):
    return jax.jit(lambda i, w: pl.pallas_call(
        kernel_fn(bb, 30),
        grid=(NC // bb,),
        in_specs=[
            pl.BlockSpec((30, bb), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((5, 6, bb, 256), lambda k: (0, 0, k, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, 6, NC, 256), jnp.int8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(i, w[:, None]))

b_old = make_build(V._builder_kernel, 4096)
b_new = make_build(_builder16, 4096)

# correctness on small slice via checksum reductions
chk = jax.jit(lambda f=None: None)
sum_old = jax.jit(lambda i, w: jnp.sum(jnp.abs(b_old(i, w).astype(jnp.int32))))
sum_new = jax.jit(lambda i, w: jnp.sum(jnp.abs(b_new(i, w).astype(jnp.int32))))
diff = jax.jit(lambda i, w: jnp.sum(jnp.abs(b_old(i, w).astype(jnp.int32) - b_new(i, w).astype(jnp.int32))))
print("builder16 total abs diff:", float(diff(ix, wj)), flush=True)

def t(label, f, n=6):
    _ = float(f(ix, wj))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); _ = float(f(ix, wj)); ts.append(time.perf_counter() - t0)
    print(f"{label}: med {sorted(ts)[len(ts)//2]*1000:.1f} ms", flush=True)

t("builder old (512K)", sum_old)
t("builder16 (512K)", sum_new)
