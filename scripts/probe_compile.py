"""Find which fused sub-program takes forever to compile on TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops import batched

rng = np.random.RandomState(0)
N, P = 1_000_000, 30
samples = jnp.asarray(rng.standard_normal((N, P)).astype(np.float32))
weights = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))

t0 = time.perf_counter()
d1 = batched.all_1d_densities(samples, weights)
s = float(jnp.sum(d1["P"]))
print(f"all_1d compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
d1 = batched.all_1d_densities(samples, weights)
s += float(jnp.sum(d1["P"]))
print(f"all_1d warm: {time.perf_counter()-t0:.3f}s", flush=True)

contours = jnp.asarray(np.array([0.68, 0.95], np.float32))
for K in (4, 64, 435):
    pairs = np.array([(i, j) for i in range(P) for j in range(i + 1, P)], np.int32)[:K]
    pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
    t0 = time.perf_counter()
    d2 = batched.all_2d_densities(samples, weights, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], contours)
    s += float(jnp.sum(d2["contours"]))
    print(f"all_2d K={K} compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    d2 = batched.all_2d_densities(samples, weights, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], contours)
    s += float(jnp.sum(d2["P"][-1]))
    print(f"all_2d K={K} warm: {time.perf_counter()-t0:.3f}s", flush=True)
print("done", s)
