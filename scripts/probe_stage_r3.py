"""Stage attribution for the round-3 bench (DFT-conv integrated), on-chip.

Times on the EXACT bench chain: full fused triangle, the 1D stage alone,
the 2D stage alone and with mult-bias knocked out, and the tiled
histogram kernel alone.
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


def t(label, f, n=3):
    out = f()
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        s += float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1000:.0f} ms", flush=True)


def main():
    samples, weights = bench.make_chain(bench.N_SAMPLES, bench.N_PARAMS)
    dev_s, dev_w = B.prepare_chain(samples, weights)
    p = dev_s.shape[1]
    pairs = np.array([(i, j) for i in range(p) for j in range(i + 1, p)], np.int32)
    pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
    contours = jnp.asarray(np.array([0.68, 0.95], np.float32))
    static_pairs = tuple(map(tuple, pairs.tolist()))

    t("full triangle", lambda: B._triangle_program(
        dev_s, dev_w, pa, pb, contours, None, None, None, 256, True, static_pairs, True, False,
        enable_shear=B._sniff_shear(samples, 0.95, pairs=pairs, weights=weights)))

    t("all_1d alone", lambda: B.all_1d_densities(dev_s, dev_w))
    d1 = B.all_1d_densities(dev_s, dev_w)
    args = (dev_s, dev_w, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], contours)
    kw = dict(use_pallas=True, static_pairs=static_pairs, int8_weights=True)
    t("all_2d full", lambda: B.all_2d_densities(*args, **kw))
    t("all_2d mult_bias=0", lambda: B.all_2d_densities(*args, mult_bias_order=0, **kw))

    n = dev_s.shape[0]
    fine_width = (d1["range"][1] - d1["range"][0]) / 255.0
    ix = jax.vmap(lambda col, lo, w: jnp.clip(((col - lo) / w + 0.5).astype(jnp.int32), 0, 255))(
        dev_s.T, d1["range"][0], fine_width
    ).astype(jnp.uint8)
    _, _, _, gather = tile_plan(p, static_pairs)
    n_chunks = max(1, int(np.ceil(n / 262144)))
    quantum = n_chunks * 16384
    n_pad = (-n) % quantum
    ixp = jnp.pad(ix, ((0, 0), (0, n_pad)))
    wp = jnp.pad(dev_w, (0, n_pad))
    t("tiled hist alone", lambda: pair_histograms_tiled(
        ixp, wp, p, tuple(int(g) for g in gather), n_chunks=n_chunks, int8_weights=True))


if __name__ == "__main__":
    main()
