"""Knockouts inside the int8 grouped kernel."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops.pallas_kernels import group_pairs

N, P, G, BLK = 1_048_576, 30, 8, 4096
rng = np.random.RandomState(0)
ix = jnp.asarray(rng.randint(0,256,(P,N)).astype(np.uint8))
w8 = jnp.asarray(rng.randint(1,5,N).astype(np.int8))
pairs = [(i,j) for i in range(P) for j in range(i+1,P)]
ga, gb, inv = group_pairs(pairs, G)
Kg = len(gb)

def make(variant):
    def kern(cols_ref, w_ref, out_ref):
        i = pl.program_id(1)
        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 256), 1)
        col_b = cols_ref[0, G].astype(jnp.int32)
        if variant == "noweight":
            weighted_b = (col_b[:, None] == lanes).astype(jnp.int8)
        else:
            w32 = w_ref[:, 0].astype(jnp.int32)[:, None]
            weighted_b = ((col_b[:, None] == lanes).astype(jnp.int32) * w32).astype(jnp.int8)
        for j in range(G):
            col_a = cols_ref[0, j].astype(jnp.int32)
            oa = (col_a[:, None] == lanes).astype(jnp.int8)
            if variant == "onedot":
                if j == 0:
                    out_ref[0, j] += jax.lax.dot_general(weighted_b, oa, (((0,),(0,)),((),())), preferred_element_type=jnp.int32)
            else:
                out_ref[0, j] += jax.lax.dot_general(weighted_b, oa, (((0,),(0,)),((),())), preferred_element_type=jnp.int32)
    return kern

def build(variant):
    @jax.jit
    def run(ix, w, ga_, gb_, inv_):
        p, n = ix.shape
        rows = jnp.concatenate([ga_, jnp.broadcast_to(gb_[:, None], (Kg, G))], axis=1)
        cols = jnp.take(ix, rows.reshape(-1), axis=0).reshape(Kg, 2*G, n)
        out = pl.pallas_call(make(variant), grid=(Kg, n // BLK),
            in_specs=[pl.BlockSpec((1, 2*G, BLK), lambda kk, ii: (kk, 0, ii), memory_space=pltpu.VMEM),
                      pl.BlockSpec((BLK, 1), lambda kk, ii: (ii, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, G, 256, 256), lambda kk, ii: (kk, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Kg, G, 256, 256), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))(cols, w[:, None])
        return out
    return run

a = (ix, w8, jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv))
for v in ("full", "noweight", "onedot"):
    try:
        f = build(v)
        out = f(*a); s = int(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(3): s += int(jnp.sum(f(*a)))
        print(f"{v}: {(time.perf_counter()-t0)/3*1000:.0f} ms", flush=True)
    except Exception as e:
        print(f"{v}: FAILED {str(e)[:120]}", flush=True)
