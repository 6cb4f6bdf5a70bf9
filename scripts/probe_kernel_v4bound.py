"""Speed bound for b-anchored grouping: all 8 pairs per step share one
weighted_b (results wrong; timing only)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
N, P, G, BLK = 1_048_576, 30, 8, 4096
rng = np.random.RandomState(0)
ix = jnp.asarray(rng.randint(0,256,(P,N)).astype(np.uint8))
w = jnp.asarray(rng.randint(1,5,N).astype(np.float32))
pairs = np.array([(i,j) for i in range(P) for j in range(i+1,P)], np.int32)
K = len(pairs); Kp = ((K+G-1)//G)*G
pad = np.vstack([pairs, np.zeros((Kp-K,2),np.int32)])
pa, pb = jnp.asarray(pad[:,0]), jnp.asarray(pad[:,1])

def kern(cols_ref, w_ref, out_ref):
    i = pl.program_id(1)
    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 256), 1)
    wb = w_ref[:, 0].astype(jnp.bfloat16)[:, None]
    col_b = cols_ref[0, 1].astype(jnp.int32)
    weighted_b = (col_b[:, None] == lanes).astype(jnp.bfloat16) * wb  # shared
    for j in range(G):
        col_a = cols_ref[0, 2 * j].astype(jnp.int32)
        onehot_a = (col_a[:, None] == lanes).astype(jnp.bfloat16)
        out_ref[0, j] += jax.lax.dot_general(weighted_b, onehot_a, (((0,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)

@jax.jit
def run(ix, weights, pa, pb):
    p, n = ix.shape
    cols = jnp.stack([jnp.take(ix, pa, axis=0), jnp.take(ix, pb, axis=0)], axis=1).reshape(Kp//G, 2*G, n)
    return pl.pallas_call(kern, grid=(Kp//G, n//BLK),
        in_specs=[pl.BlockSpec((1, 2*G, BLK), lambda kk, ii: (kk, 0, ii), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK, 1), lambda kk, ii: (ii, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, 256, 256), lambda kk, ii: (kk, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp//G, G, 256, 256), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024))(cols, weights[:, None])

out = run(ix, w, pa, pb); s = float(jnp.sum(out))
t0 = time.perf_counter()
for _ in range(3): s += float(jnp.sum(run(ix, w, pa, pb)))
print(f"shared-b bound (435 dots equiv): {(time.perf_counter()-t0)/3*1000:.0f} ms")
