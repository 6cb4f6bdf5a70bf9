"""v4: b-anchored grouped pair histograms (production prototype).

Pairs are grouped host-side by their b (row) parameter into chunks of G;
each grid step builds ONE shared weighted_b one-hot and G a-side one-hots.
Pad slots repeat a=b and are dropped by the inverse permutation."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")

def group_pairs(pairs, G):
    from collections import defaultdict
    byb = defaultdict(list)
    for k, (a, b) in enumerate(pairs):
        byb[b].append((a, k))
    grp_a, grp_b, orig = [], [], []
    for b, items in sorted(byb.items()):
        for c in range(0, len(items), G):
            chunk = items[c:c + G]
            pad = G - len(chunk)
            grp_b.append(b)
            grp_a.append([a for a, _ in chunk] + [b] * pad)
            orig.append([k for _, k in chunk] + [-1] * pad)
    grp_a = np.array(grp_a, np.int32); grp_b = np.array(grp_b, np.int32)
    orig = np.array(orig, np.int32)
    inv = np.zeros(len(pairs), np.int32)
    flat = orig.reshape(-1)
    for pos, k in enumerate(flat):
        if k >= 0: inv[k] = pos
    return grp_a, grp_b, inv

def make(G, BLK, NROW):
    def kern(cols_ref, w_ref, out_ref):
        i = pl.program_id(1)
        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 256), 1)
        wb = w_ref[:, 0].astype(jnp.bfloat16)[:, None]
        col_b = cols_ref[0, G].astype(jnp.int32)
        weighted_b = (col_b[:, None] == lanes).astype(jnp.bfloat16) * wb
        for j in range(G):
            col_a = cols_ref[0, j].astype(jnp.int32)
            onehot_a = (col_a[:, None] == lanes).astype(jnp.bfloat16)
            out_ref[0, j] += jax.lax.dot_general(weighted_b, onehot_a, (((0,), (0,)), ((), ())),
                                                 preferred_element_type=jnp.float32)
    return kern

def build(G, BLK):
    NROW = 2 * G  # rows: a0..aG-1, then b replicated
    def run_impl(ix_pm, weights, grp_a, grp_b, inv):
        p, n = ix_pm.shape
        Kg = grp_a.shape[0]
        rows = jnp.concatenate([grp_a, jnp.broadcast_to(grp_b[:, None], (Kg, G))], axis=1)  # (Kg, 2G)
        cols = jnp.take(ix_pm, rows.reshape(-1), axis=0).reshape(Kg, NROW, n)
        out = pl.pallas_call(make(G, BLK, NROW), grid=(Kg, n // BLK),
            in_specs=[pl.BlockSpec((1, NROW, BLK), lambda kk, ii: (kk, 0, ii), memory_space=pltpu.VMEM),
                      pl.BlockSpec((BLK, 1), lambda kk, ii: (ii, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, G, 256, 256), lambda kk, ii: (kk, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Kg, G, 256, 256), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024))(cols, weights[:, None])
        return jnp.take(out.reshape(Kg * G, 256, 256), inv, axis=0)
    return jax.jit(run_impl)

N, P = 1_048_576, 30
rng = np.random.RandomState(0)
ix_np = rng.randint(0, 256, (N, P))
ix = jnp.asarray(ix_np.T.astype(np.uint8))
w = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))
wn = np.asarray(w)
pairs = [(i, j) for i in range(P) for j in range(i + 1, P)]

for G, BLK in ((4, 4096), (8, 4096)):
    ga, gb, inv = group_pairs(pairs, G)
    f = build(G, BLK)
    try:
        out = f(ix, w, jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv)); s = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(3): s += float(jnp.sum(f(ix, w, jnp.asarray(ga), jnp.asarray(gb), jnp.asarray(inv))))
        print(f"v4 G={G} BLK={BLK} (Kg={len(gb)}): {(time.perf_counter()-t0)/3*1000:.0f} ms", flush=True)
        h = np.asarray(out)
        for k in (0, 7, 200, 434):
            a, b = pairs[k]
            expect = np.zeros((256, 256))
            np.add.at(expect, (ix_np[:, b], ix_np[:, a]), wn)
            assert np.array_equal(h[k], expect), f"pair {k} mismatch"
        print("exactness ok", flush=True)
    except Exception as e:
        print(f"v4 G={G}: FAILED {str(e)[:200]}", flush=True)
