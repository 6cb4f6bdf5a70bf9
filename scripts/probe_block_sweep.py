"""Sweep the histogram kernel's dot block depth and builder block size.

The dot kernels run at ~75% of the int8 MXU floor; deeper contraction
blocks amortize accumulator writes, bigger builder blocks amortize VPU
setup — but both raise VMEM pressure and can break double-buffering.
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
_, _, _, gather = tile_plan(p, pairs)
gt = tuple(int(g) for g in gather)

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

for block, build_block in ((1024, 4096), (2048, 4096), (4096, 8192)):
    def run(block=block, build_block=build_block):
        return pair_histograms_tiled(
            ixp, wp, p, gt, n_chunks=n_chunks, block=block, build_block=build_block, int8_weights=True
        )

    try:
        out = run()
        s = float(jnp.sum(out[0]))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = run()
            s += float(jnp.sum(out[-1]))
            best = min(best, time.perf_counter() - t0)
        print(f"block={block} build={build_block}: {best * 1000:.0f} ms", flush=True)
    except Exception as e:
        print(f"block={block} build={build_block} failed: {repr(e)[:200]}", flush=True)
