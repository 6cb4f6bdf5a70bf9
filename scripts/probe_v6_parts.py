"""Decompose v6b time: build pass vs off kernel vs diag kernel."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import scripts.probe_kernel_v6 as V
from functools import partial
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.RandomState(0)
N, P = 1 << 20, 30
ixj = jnp.asarray(rng.randint(0, 256, (P, N)).astype(np.uint8))
wj = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))

NCH, BLK = 4, 1024
nc = N // NCH

@partial(jax.jit, static_argnames=())
def build_only(ix_pm, weights):
    ix = jnp.pad(ix_pm, ((0, V.P_PAD - P), (0, 0)))
    ix_c = ix.reshape(V.P_PAD, NCH, nc).transpose(1, 0, 2)
    w_c = weights.reshape(NCH, nc)
    def body(acc, xs):
        ixk, wk = xs
        lanes = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 256), 2)
        match = ixk.reshape(V.P_PAD, nc, 1) == lanes
        W = jnp.where(match, wk.astype(jnp.int8)[None, :, None], jnp.int8(0))
        return acc + W[:, 0, :].astype(jnp.int32).sum(), None
    acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (ix_c, w_c))
    return acc

def timeit(label, fn, *a):
    r = fn(*a); jax.block_until_ready(r); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); r=fn(*a); jax.block_until_ready(r)
        _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        ts.append(time.perf_counter()-t0)
    print(f"{label}: med {sorted(ts)[2]*1000:.0f} ms", flush=True)

timeit("build pass only (W + reduce)", build_only, ixj, wj)
timeit("v6b full", lambda a,b: V.tile_pair_histograms_b(a,b,n_chunks=NCH,block=BLK), ixj, wj)

# off / diag alone on prebuilt W for one chunk scaled x4
ix = jnp.pad(ixj, ((0, V.P_PAD - P), (0, 0)))
lanes = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 256), 2)
@jax.jit
def mk_W(ixk, wk):
    match = ixk.reshape(V.P_PAD, nc, 1) == lanes
    return jnp.where(match, wk.astype(jnp.int8)[None, :, None], jnp.int8(0)).reshape(V.NG, V.G, nc, 256)
W1 = mk_W(ix[:, :nc], wj[:nc]); jax.block_until_ready(W1)

a_tbl = jnp.asarray(np.array([a for a, _ in V.OFF_TILES], np.int32))
b_tbl = jnp.asarray(np.array([b for _, b in V.OFF_TILES], np.int32))

@jax.jit
def off_only(W):
    grid_off = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(len(V.OFF_TILES), nc // BLK),
        in_specs=[
            pl.BlockSpec((1, V.G, BLK, 256), lambda t, i, at, bt: (at[t], 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V.G, BLK, 256), lambda t, i, at, bt: (bt[t], 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, 256, 256), lambda t, i, at, bt: (t, 0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        lambda at, bt, wa, wb, o: V._off_kernel_b(BLK)(wa, wb, o),
        grid_spec=grid_off,
        out_shape=jax.ShapeDtypeStruct((len(V.OFF_TILES), 64, 256, 256), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(a_tbl, b_tbl, W, W)

@jax.jit
def diag_only(W):
    return pl.pallas_call(
        V._diag_kernel_b(BLK),
        grid=(V.NG, nc // BLK),
        in_specs=[pl.BlockSpec((1, V.G, BLK, 256), lambda t, i: (t, 0, i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 28, 256, 256), lambda t, i: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V.NG, 28, 256, 256), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(W)

timeit("off kernel only (1 chunk = 1/4 of work)", off_only, W1)
timeit("diag kernel only (1 chunk)", diag_only, W1)
timeit("mk_W only (1 chunk)", mk_W, ix[:, :nc], wj[:nc])
