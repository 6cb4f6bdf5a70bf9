"""Sweep the tile-plan group size: MXU work is identical (435 dots for any
group; diagonal tiles only compute i<j slots) but the HBM re-read count of
the materialized one-hot stacks W is (ng-1 off + 1 diag) per group:
group=6 -> 5x, group=10 -> 3x, group=15 -> 2x.  VMEM for the off-tile
accumulator grows as (group^2, 256, 256) int32: 59 MB at group=15.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from getdist_tpu.ops import batched as B
from getdist_tpu.ops.pallas_kernels import pair_histograms_tiled, tile_plan

samples, weights = bench.make_chain(bench.N_SAMPLES, bench.N_PARAMS)
dev_s, dev_w = B.prepare_chain(samples, weights)
p = dev_s.shape[1]
pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]

d1 = B.all_1d_densities(dev_s, dev_w)
_ = float(jnp.sum(d1["P"]))
n = dev_s.shape[0]
fine_width = (d1["range"][1] - d1["range"][0]) / 255.0
ix = jax.vmap(lambda col, lo, w: jnp.clip(((col - lo) / w + 0.5).astype(jnp.int32), 0, 255))(
    dev_s.T, d1["range"][0], fine_width
).astype(jnp.uint8)
n_chunks = max(1, int(np.ceil(n / 262144)))
quantum = n_chunks * 16384
n_pad = (-n) % quantum
ixp = jnp.pad(ix, ((0, 0), (0, n_pad)))
wp = jnp.pad(dev_w, (0, n_pad))

ref = None
for group in (6, 10, 15):
    _, _, _, gather = tile_plan(p, pairs, group=group)
    gt = tuple(int(g) for g in gather)

    def run(group=group, gt=gt):
        return pair_histograms_tiled(ixp, wp, p, gt, group=group, n_chunks=n_chunks, int8_weights=True)

    try:
        out = run()
        s = float(jnp.sum(out[0]))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = run()
            s += float(jnp.sum(out[-1]))
            best = min(best, time.perf_counter() - t0)
        if ref is None:
            ref = np.asarray(out[:8])
            err = 0.0
        else:
            err = float(np.abs(np.asarray(out[:8]) - ref).max())
        print(f"group={group}: {best * 1000:.0f} ms  (max delta vs group6 on first 8: {err})", flush=True)
    except Exception as e:
        print(f"group={group} failed: {repr(e)[:250]}", flush=True)
