"""Attribute the post-histogram 2D time with the current pipeline."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops import batched as B
rng = np.random.RandomState(0)
N, P = 1_000_000, 30
s = jnp.asarray(rng.standard_normal((N, P)).astype(np.float32))
w = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))
pairs = [(i, j) for i in range(P) for j in range(i + 1, P)]
pa = jnp.asarray(np.array([a for a, _ in pairs], np.int32))
pb = jnp.asarray(np.array([b for _, b in pairs], np.int32))
cont = jnp.asarray(np.array([0.68, 0.95], np.float32))
d1 = B.all_1d_densities(s, w)
_ = float(jnp.sum(d1["P"]))
a = (s, w, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], cont)
sp = tuple(pairs)
def t(label, **kw):
    out = B.all_2d_densities(*a, static_pairs=sp, use_pallas=True, **kw)
    sm = float(jnp.sum(out["P"]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = B.all_2d_densities(*a, static_pairs=sp, use_pallas=True, **kw)
        sm += float(jnp.sum(out["P"]))
    print(f"{label}: {(time.perf_counter()-t0)/3*1000:.0f} ms", flush=True)
t("full")
t("no mult-bias", mult_bias_order=0)
t("winw=16", winw=16)
