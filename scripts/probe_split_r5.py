"""r5 probe: fused-call overhead + new histogram defaults, interleaved.

Times, A/B-interleaved in one session to cancel tunnel/chip drift:
  A. _triangle_program (the headline inner: all_1d + all_2d, async)
  B. the same two programs called directly with identical arguments
  C. the tiled histogram kernel alone (new adaptive group/chunk defaults)

Run: python scripts/probe_split_r5.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from getdist_tpu.ops import batched as B

REPS = 6


def main():
    print(f"# backend: {jax.default_backend()}")
    samples, weights = bench.make_chain(bench.N_SAMPLES, bench.N_PARAMS)
    dev_s, dev_w = B.prepare_chain(samples, weights)
    p = dev_s.shape[1]
    pairs = np.array([(i, j) for i in range(p) for j in range(i + 1, p)], np.int32)
    pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
    contours = jnp.asarray(np.array([0.68, 0.95], np.float32))
    static_pairs = tuple(map(tuple, pairs.tolist()))
    shear = B._sniff_shear(samples, 0.95, pairs=pairs, weights=weights)
    n_shear = len(shear) if isinstance(shear, tuple) else shear
    print(f"# shear subset: {n_shear}")

    def run_a():
        return B._triangle_program(
            dev_s, dev_w, pa, pb, contours, None, None, None,
            256, True, static_pairs, True, False, enable_shear=shear,
        )

    def run_b():
        d1 = B.all_1d_densities(dev_s, dev_w)
        d2 = B.all_2d_densities(
            dev_s, dev_w, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], contours,
            use_pallas=True, static_pairs=static_pairs, int8_weights=True,
            sigma_range=d1["sigma_range"], enable_shear=shear,
        )
        return d1, d2

    def sync(out):
        d1, d2 = out
        return float(jnp.sum(d1["P"][-1]) + jnp.sum(d2["P"][-1]) + jnp.sum(d2["contours"][-1]))

    # compile both
    s = sync(run_a())
    s += sync(run_b())
    print("# compiled; interleaved timing")
    times = {"A_triangle_program": [], "B_split_calls": []}
    for _ in range(REPS):
        for label, fn in (("A_triangle_program", run_a), ("B_split_calls", run_b)):
            t0 = time.perf_counter()
            s += sync(fn())
            times[label].append(time.perf_counter() - t0)
    for label, ts in times.items():
        print(f"{label}: best {min(ts) * 1000:.1f} ms  all {[f'{t * 1000:.0f}' for t in ts]}")

    # histogram kernel alone with the new production defaults
    from getdist_tpu.ops.pallas_kernels import pair_histograms_tiled, tile_plan

    d1 = B.all_1d_densities(dev_s, dev_w)
    fine_width = (d1["range"][1] - d1["range"][0]) / 255.0
    ix = jax.vmap(lambda col, lo, w: jnp.clip(((col - lo) / w + 0.5).astype(jnp.int32), 0, 255))(
        dev_s.T, d1["range"][0], fine_width
    ).astype(jnp.uint8)
    n = dev_s.shape[0]
    group, n_chunks = 10, 1
    quantum = n_chunks * 16384
    n_pad = (-n) % quantum
    ixp = jnp.pad(ix, ((0, 0), (0, n_pad)))
    wp = jnp.pad(dev_w, (0, n_pad))
    _, _, _, gather = tile_plan(p, static_pairs, group=group)

    def run_c():
        return pair_histograms_tiled(
            ixp, wp, p, tuple(int(g) for g in gather), group=group, n_chunks=n_chunks, int8_weights=True
        )

    s += float(jnp.sum(run_c()[-1]))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s += float(jnp.sum(run_c()[-1]))
        ts.append(time.perf_counter() - t0)
    print(f"C_hist_new_defaults: best {min(ts) * 1000:.1f} ms")
    print(f"# sync {s:.3e}")


if __name__ == "__main__":
    main()
