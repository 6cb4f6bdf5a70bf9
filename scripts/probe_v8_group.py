"""v8 probe: production tiled histogram kernel at larger group sizes.

For 30 params every divisor-group G in {6, 10, 15} yields EXACTLY 435 dot
slots (ng*(ng-1)/2 * G^2 off + ng * G*(G-1)/2 diag), so the MXU flops are
identical — but the off-tile W traffic scales as ng*(ng-1) slab reads:
G=6 reads each group slab 4x (20 reads / 5 slabs), G=10 reads it 2x,
G=15 reads it 1x. If the measured ~50 ms gap over the 145 ms int8 MXU
floor is W HBM re-reads, bigger groups close part of it. VMEM bound:
the off out block is G^2*256*256*4 B (G=10: 26 MB, G=15: 59 MB) against
the 100 MB scoped limit, so G=15 may need a smaller sample block.

Run on the real chip: python scripts/probe_v8_group.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from getdist_tpu.ops.pallas_kernels import pair_histograms_tiled, tile_plan

P, N = 30, 1_000_000


def bench_inputs():
    rng = np.random.RandomState(0)
    ix = rng.randint(0, 256, size=(P, N)).astype(np.uint8)
    w = rng.randint(1, 5, N).astype(np.float64)
    pairs = [(i, j) for i in range(P) for j in range(i + 1, P)]
    return jnp.asarray(ix), jnp.asarray(w.astype(np.float32)), pairs


def time_config(ix, w, pairs, group, n_chunks, block, reps=5):
    _, _, _, gather = tile_plan(P, pairs, group=group)
    gather = tuple(int(g) for g in gather)

    def run():
        return pair_histograms_tiled(
            ix, w, P, gather, group=group, n_chunks=n_chunks, block=block, int8_weights=True
        )

    try:
        out = run()
        sync = float(jnp.sum(out[-1]))
    except Exception as e:
        print(f"group={group} n_chunks={n_chunks} block={block}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None, None
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        sync += float(jnp.sum(out[-1]))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"group={group:2d} n_chunks={n_chunks} block={block:5d}: {best * 1000:7.1f} ms  (sync {sync:.0f})")
    return best, out


def main():
    print(f"# backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    ix, w, pairs = bench_inputs()

    # correctness cross-check on a small slice first
    ix_s, w_s = ix[:, :8192], w[:8192]
    ref = None
    for group in (6, 10, 15):
        _, _, _, gather = tile_plan(P, pairs, group=group)
        out = np.asarray(
            pair_histograms_tiled(ix_s, w_s, P, tuple(map(int, gather)), group=group, n_chunks=1,
                                  block=1024, build_block=1024, int8_weights=True)
        )
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), f"group={group} mismatch"
    print("# small-slice cross-check: all groups bit-identical")

    results = {}
    for group, n_chunks, block in [
        (6, 4, 1024),
        (6, 1, 1024),
        (10, 4, 1024),
        (10, 1, 1024),
        (10, 1, 2048),
        (15, 1, 512),
        (15, 1, 1024),
    ]:
        best, _ = time_config(ix, w, pairs, group, n_chunks, block)
        if best is not None:
            results[(group, n_chunks, block)] = best
    if results:
        best_cfg = min(results, key=results.get)
        print(f"# BEST: group={best_cfg[0]} n_chunks={best_cfg[1]} block={best_cfg[2]} "
              f"at {results[best_cfg] * 1000:.1f} ms")


if __name__ == "__main__":
    main()
