"""Does Mosaic support int8 x int8 -> int32 dot_general? If so, integer-weight
chains could run the pair-histogram kernel at 2x the bf16 MXU rate."""
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

def kern(cols_ref, w_ref, out_ref):
    i = pl.program_id(1)
    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 256), 1)
    w32 = w_ref[:, 0].astype(jnp.int32)[:, None]
    col_b = cols_ref[0, G].astype(jnp.int32)
    # int8*int8 elementwise multiply is unsupported in Mosaic; go via int32
    weighted_b = ((col_b[:, None] == lanes).astype(jnp.int32) * w32).astype(jnp.int8)
    for j in range(G):
        col_a = cols_ref[0, j].astype(jnp.int32)
        onehot_a = (col_a[:, None] == lanes).astype(jnp.int8)
        out_ref[0, j] += jax.lax.dot_general(weighted_b, onehot_a, (((0,), (0,)), ((), ())),
                                             preferred_element_type=jnp.int32)

@jax.jit
def run(ix, w, ga_, gb_, inv_):
    p, n = ix.shape
    rows = jnp.concatenate([ga_, jnp.broadcast_to(gb_[:, None], (Kg, G))], axis=1)
    cols = jnp.take(ix, rows.reshape(-1), axis=0).reshape(Kg, 2*G, n)
    out = pl.pallas_call(kern, grid=(Kg, n // BLK),
        in_specs=[pl.BlockSpec((1, 2*G, BLK), lambda kk, ii: (kk, 0, ii), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK, 1), lambda kk, ii: (ii, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, 256, 256), lambda kk, ii: (kk, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kg, G, 256, 256), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))(cols, w[:, None])
    return jnp.take(out.reshape(Kg*G, 256, 256), inv_, axis=0)

a = (ix, w8, jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv))
try:
    out = run(*a); s = int(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(3): s += int(jnp.sum(run(*a)))
    print(f"int8 kernel: {(time.perf_counter()-t0)/3*1000:.0f} ms (sum {s})", flush=True)
    # exactness
    h = np.asarray(out[:2]); ixn = np.asarray(ix); wn = np.asarray(w8).astype(float)
    ok = True
    for k,(aa,bb) in enumerate(pairs[:2]):
        e = np.zeros((256,256)); np.add.at(e,(ixn[bb],ixn[aa]),wn)
        ok &= np.array_equal(h[k], e)
    print("exact:", ok, flush=True)
except Exception as e:
    print("int8 FAILED:", str(e)[:250], flush=True)
