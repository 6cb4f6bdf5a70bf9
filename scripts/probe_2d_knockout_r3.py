"""Knockout attribution of the 2D stage at production geometry (round 3).

Each run times all_2d_densities on the bench chain with one stage
monkeypatched out; the delta vs full is that stage's cost inside the
single fused dispatch (dispatch floor ~27 ms cancels in deltas).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from getdist_tpu.ops import batched as B

samples, weights = bench.make_chain(bench.N_SAMPLES, bench.N_PARAMS)
dev_s, dev_w = B.prepare_chain(samples, weights)
p = dev_s.shape[1]
pairs = np.array([(i, j) for i in range(p) for j in range(i + 1, p)], np.int32)
pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
contours = jnp.asarray(np.array([0.68, 0.95], np.float32))
static_pairs = tuple(map(tuple, pairs.tolist()))
sniff = B._sniff_shear(samples, 0.95, pairs=pairs, weights=weights)
print(f"# shear subset: {len(sniff) if isinstance(sniff, tuple) else sniff} pairs", flush=True)

d1 = B.all_1d_densities(dev_s, dev_w)
_ = float(jnp.sum(d1["P"]))
args = (dev_s, dev_w, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], contours)
kw = dict(use_pallas=True, static_pairs=static_pairs, int8_weights=True, enable_shear=sniff)


def t(label, fn, n=4):
    out = fn()
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        s += float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1000:.0f} ms", flush=True)


t("full", lambda: B.all_2d_densities(*args, **kw))
t("shear off", lambda: B.all_2d_densities(*args, **{**kw, "enable_shear": False}))
t("mult_bias 0", lambda: B.all_2d_densities(*args, mult_bias_order=0, **kw))

orig_kb = B._kernel_bandwidth_2d


def stub_kb(hist, neff, sample_corr, do_correlation, fallback_t=None, power_override=None, use_override=False):
    w = jnp.full((), 0.05, hist.dtype)
    return w, w, jnp.zeros((), hist.dtype), jnp.ones((), bool), jnp.zeros((), bool)


B._kernel_bandwidth_2d = stub_kb
jax.clear_caches()
t("optimizer stubbed", lambda: B.all_2d_densities(*args, **kw))
B._kernel_bandwidth_2d = orig_kb

orig_cl = B._contour_levels_batch
B._contour_levels_batch = lambda grids, c, iters=40: jnp.zeros((grids.shape[0], c.shape[0]), grids.dtype)
jax.clear_caches()
t("contours stubbed", lambda: B.all_2d_densities(*args, **kw))
B._contour_levels_batch = orig_cl

jax.clear_caches()
t("full again", lambda: B.all_2d_densities(*args, **kw))
