"""v5 probe: build all G a-side one-hots before the dots (explicit software
pipelining) vs interleaved build+dot."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops.pallas_kernels import group_pairs

N, P, G = 1_048_576, 30, 8
rng = np.random.RandomState(0)
ix = jnp.asarray(rng.randint(0,256,(P,N)).astype(np.uint8))
w = jnp.asarray(rng.randint(1,5,N).astype(np.float32))
pairs = [(i,j) for i in range(P) for j in range(i+1,P)]
ga, gb, inv = group_pairs(pairs, G)
Kg = len(gb)

def make(BLK, prebuild):
    def kern(cols_ref, w_ref, out_ref):
        i = pl.program_id(1)
        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 256), 1)
        wb = w_ref[:, 0].astype(jnp.bfloat16)[:, None]
        col_b = cols_ref[0, G].astype(jnp.int32)
        weighted_b = (col_b[:, None] == lanes).astype(jnp.bfloat16) * wb
        if prebuild:
            ohs = [
                (cols_ref[0, j].astype(jnp.int32)[:, None] == lanes).astype(jnp.bfloat16)
                for j in range(G)
            ]
            for j in range(G):
                out_ref[0, j] += jax.lax.dot_general(weighted_b, ohs[j], (((0,), (0,)), ((), ())),
                                                     preferred_element_type=jnp.float32)
        else:
            for j in range(G):
                oh = (cols_ref[0, j].astype(jnp.int32)[:, None] == lanes).astype(jnp.bfloat16)
                out_ref[0, j] += jax.lax.dot_general(weighted_b, oh, (((0,), (0,)), ((), ())),
                                                     preferred_element_type=jnp.float32)
    @jax.jit
    def run(ix, w, ga_, gb_, inv_):
        p, n = ix.shape
        rows = jnp.concatenate([ga_, jnp.broadcast_to(gb_[:, None], (Kg, G))], axis=1)
        cols = jnp.take(ix, rows.reshape(-1), axis=0).reshape(Kg, 2*G, n)
        out = pl.pallas_call(kern, grid=(Kg, n // BLK),
            in_specs=[pl.BlockSpec((1, 2*G, BLK), lambda kk, ii: (kk, 0, ii), memory_space=pltpu.VMEM),
                      pl.BlockSpec((BLK, 1), lambda kk, ii: (ii, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, G, 256, 256), lambda kk, ii: (kk, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Kg, G, 256, 256), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))(cols, w[:, None])
        return jnp.take(out.reshape(Kg*G, 256, 256), inv_, axis=0)
    return run

a = (ix, w, jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv))
for BLK, pre in ((4096, False), (4096, True), (2048, True), (2048, False)):
    try:
        f = make(BLK, pre)
        out = f(*a); s = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(3): s += float(jnp.sum(f(*a)))
        print(f"BLK={BLK} prebuild={pre}: {(time.perf_counter()-t0)/3*1000:.0f} ms (sum {s:.0f})", flush=True)
    except Exception as e:
        print(f"BLK={BLK} prebuild={pre}: FAILED {str(e)[:120]}", flush=True)
