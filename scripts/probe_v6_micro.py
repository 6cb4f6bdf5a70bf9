"""Micro: off-kernel pure throughput, builder throughput, acc cost."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
import scripts.probe_kernel_v6c as V

rng = np.random.RandomState(0)
NC = 1 << 19  # one chunk = 512K
BLK = 1024
ix = jnp.asarray(rng.randint(0, 256, (30, NC)).astype(np.uint8))
wj = jnp.asarray(rng.randint(1, 5, NC).astype(np.float32))

a_tbl = jnp.asarray(np.array([a for a, _ in V.OFF_TILES], np.int32))
b_tbl = jnp.asarray(np.array([b for _, b in V.OFF_TILES], np.int32))

build = jax.jit(lambda i, w: pl.pallas_call(
    V._builder_kernel(4096, 30),
    grid=(NC // 4096,),
    in_specs=[
        pl.BlockSpec((30, 4096), lambda k: (0, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((4096, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((5, 6, 4096, 256), lambda k: (0, 0, k, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((5, 6, NC, 256), jnp.int8),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)(i, w[:, None]))

W = build(ix, wj); jax.block_until_ready(W)

def offk(Warr):
    grid_off = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(10, NC // BLK),
        in_specs=[
            pl.BlockSpec((1, 6, BLK, 256), lambda t, i, at, bt: (at[t], 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, BLK, 256), lambda t, i, at, bt: (bt[t], 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 36, 256, 256), lambda t, i, at, bt: (t, 0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        lambda at, bt, wa, wb, o: V._off_kernel()(wa, wb, o),
        grid_spec=grid_off,
        out_shape=jax.ShapeDtypeStruct((10, 36, 256, 256), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(a_tbl, b_tbl, Warr, Warr)

off_sum = jax.jit(lambda Warr: jnp.sum(offk(Warr)[:, :, ::64, ::64]))
diag_sum = jax.jit(lambda Warr: jnp.sum(pl.pallas_call(
    V._diag_kernel(),
    grid=(5, NC // BLK),
    in_specs=[pl.BlockSpec((1, 6, BLK, 256), lambda t, i: (t, 0, i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 15, 256, 256), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((5, 15, 256, 256), jnp.int32),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)(Warr)[:, :, ::64, ::64]))
build_sum = jax.jit(lambda i, w: jnp.sum(build(i, w)[:, :, ::1024, ::64].astype(jnp.int32)))

def t(label, f, *a, n=6):
    r = f(*a); _ = float(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = f(*a); _ = float(r)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: med {sorted(ts)[len(ts)//2]*1000:.1f} ms (x2 for 1M = {sorted(ts)[len(ts)//2]*2000:.0f})", flush=True)

t("builder (512K)", build_sum, ix, wj)
t("off kernel (512K)", off_sum, W)
t("diag kernel (512K)", diag_sum, W)

# --- hi/lo factored builder ---
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

build16 = jax.jit(lambda i, w: pl.pallas_call(
    _builder16(4096, 30),
    grid=(NC // 4096,),
    in_specs=[
        pl.BlockSpec((30, 4096), lambda k: (0, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((4096, 1), lambda k: (k, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((5, 6, 4096, 256), lambda k: (0, 0, k, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((5, 6, NC, 256), jnp.int8),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)(i, w[:, None]))

W16 = build16(ix, wj)
print("factored builder correct:", bool(jnp.all(W16 == W)), flush=True)
build16_sum = jax.jit(lambda i, w: jnp.sum(build16(i, w)[:, :, ::1024, ::64].astype(jnp.int32)))
t("builder16 (512K)", build16_sum, ix, wj)
