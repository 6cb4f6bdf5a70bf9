"""In-kernel knockouts: attribute per-step time in the pair-histogram kernel."""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")

N, P, BLK = 1_048_576, 30, 4096
rng = np.random.RandomState(0)
ix8 = jnp.asarray(rng.randint(0, 256, (N, P)).astype(np.uint8))
w = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))
pairs = np.array([(i, j) for i in range(P) for j in range(i + 1, P)], np.int32)
pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
K = pa.shape[0]

def make(variant):
    def kern(pa_ref, pb_ref, ix_ref, w_ref, out_ref):
        block, nparam = ix_ref.shape
        i = pl.program_id(1); k = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, 256), 1)
        if variant == "nocolsel":
            col_a = ix_ref[...][:, 0].astype(jnp.int32)
            col_b = ix_ref[...][:, 1].astype(jnp.int32)
        else:
            param_lane = jax.lax.broadcasted_iota(jnp.int32, (block, nparam), 1)
            ixb = ix_ref[...].astype(jnp.int32)
            col_a = jnp.sum(jnp.where(param_lane == pa_ref[k], ixb, 0), axis=1)
            col_b = jnp.sum(jnp.where(param_lane == pb_ref[k], ixb, 0), axis=1)
        onehot_a = (col_a[:, None] == lanes).astype(jnp.bfloat16)
        if variant == "onehot1":
            weighted_b = onehot_a * w_ref[:, 0].astype(jnp.bfloat16)[:, None]
        else:
            onehot_b = (col_b[:, None] == lanes).astype(jnp.bfloat16)
            if variant == "noweight":
                weighted_b = onehot_b
            else:
                weighted_b = onehot_b * w_ref[:, 0].astype(jnp.bfloat16)[:, None]
        if variant == "nodot":
            out_ref[0] += jnp.sum(weighted_b) + jnp.sum(onehot_a)
        else:
            out_ref[0] += jax.lax.dot_general(weighted_b, onehot_a, (((0,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32)
    return kern

@functools.partial(jax.jit, static_argnames=("variant",))
def run(ix_t, weights, pair_a, pair_b, variant):
    n, p = ix_t.shape
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(K, n // BLK),
        in_specs=[pl.BlockSpec((BLK, p), lambda kk, ii, a, b: (ii, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK, 1), lambda kk, ii, a, b: (ii, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 256, 256), lambda kk, ii, a, b: (kk, 0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(make(variant), grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((K, 256, 256), jnp.float32))(pair_a, pair_b, ix_t, weights[:, None])

for v in ("full", "nocolsel", "noweight", "onehot1", "nodot"):
    try:
        out = run(ix8, w, pa, pb, v); s = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(3): s += float(jnp.sum(run(ix8, w, pa, pb, v)))
        print(f"{v}: {(time.perf_counter()-t0)/3*1000:.0f} ms", flush=True)
    except Exception as e:
        print(f"{v}: FAILED {str(e)[:150]}", flush=True)
