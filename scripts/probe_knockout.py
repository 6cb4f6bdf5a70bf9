"""Knock out stages of all_2d_densities to attribute the full-program time."""
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
contours = jnp.asarray(np.array([0.68, 0.95], np.float32))

d1 = B.all_1d_densities(samples, weights)
_ = float(jnp.sum(d1["P"]))

def t(label, f, n=3):
    out = f(); s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(); s += float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.0f} ms", flush=True)

args = (samples, weights, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], contours)
t("all_1d warm", lambda: B.all_1d_densities(samples, weights))
t("all_2d full (pallas)", lambda: B.all_2d_densities(*args, use_pallas=True))
t("all_2d full (xla)", lambda: B.all_2d_densities(*args, use_pallas=False))
t("all_2d no-bias (pallas)", lambda: B.all_2d_densities(*args, use_pallas=True, mult_bias_order=0))
t("all_2d winw=16 (pallas)", lambda: B.all_2d_densities(*args, use_pallas=True, winw=16))
print("done")
