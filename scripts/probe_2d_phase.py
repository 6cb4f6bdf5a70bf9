"""Time the 2D phases separately on the real chip."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops import batched as B

rng = np.random.RandomState(0)
N, P = 1_000_000, 30
samples = jnp.asarray(rng.standard_normal((N, P)).astype(np.float32))
weights = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))
pairs = np.array([(i, j) for i in range(P) for j in range(i + 1, P)], np.int32)
pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])

cols = samples.T
binmin = jnp.min(cols, axis=1) - 0.5
binmax = jnp.max(cols, axis=1) + 0.5
fw = (binmax - binmin) / 255

@jax.jit
def make_ix():
    return jnp.clip((((cols - binmin[:, None]) / fw[:, None]) + 0.5).astype(jnp.int32), 0, 255)
ix = make_ix(); _ = float(jnp.sum(ix))

@jax.jit
def hists_only(ixx, w):
    return jax.lax.map(lambda ab: B._pair_hist_256(ixx[ab[0]], ixx[ab[1]], w), (pa, pb))

def t(label, f, *a, n=2):
    out = f(*a); s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a); s += float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.0f} ms", flush=True)
    return out

hists = t("pair hists 435", hists_only, ix, weights)

neff = jnp.full(P, 2e5)
@jax.jit
def bw_only(h):
    return jax.vmap(B._isj_bandwidth_2d)(h, jnp.minimum(neff[pa], neff[pb]))
t("bandwidths 435 (vmap)", bw_only, hists)

rx = jnp.full(435, 3.0); ry = jnp.full(435, 2.5); c = jnp.zeros(435)
@jax.jit
def conv_only(h):
    k = jax.vmap(lambda a, b, cc: B._gauss_kernel_2d(a, b, cc, 30, jnp.float32))(rx, ry, c)
    return B._conv2d_same_batch(h, k, 512)
t("kernels+conv 435", conv_only, hists)

@jax.jit
def contours_only(h):
    d = h / jnp.max(h, axis=(1, 2), keepdims=True)
    return B._contour_levels_batch(d, jnp.asarray(np.array([0.68, 0.95], np.float32)))
t("contour bisection 435", contours_only, hists)
print("done")
