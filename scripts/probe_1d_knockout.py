"""Attribute all_1d_densities time by stage knockouts."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops import batched as B

rng = np.random.RandomState(0)
N, P = 1_000_000, 30
s = jnp.asarray(rng.standard_normal((N, P)).astype(np.float32))
w = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))

def t(label, f, n=3):
    out = f(); sm = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(); sm += float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)

cols = s.T
fine = 1024
mins = jnp.min(cols, axis=1); maxs = jnp.max(cols, axis=1)
width = (maxs - mins) / (fine - 1)
ix = jnp.clip((((cols - mins[:, None]) / width[:, None]) + 0.5).astype(jnp.int32), 0, fine - 1)

t("full all_1d", lambda: B.all_1d_densities(s, w))
t("hist rows only", lambda: jax.jit(B._onehot_hist_rows, static_argnums=2)(ix, w, fine))
t("neff kde batch", lambda: jax.jit(B._neff_kde_batch)(cols, w, ix))
t("moments", lambda: jax.jit(lambda c, ww: (c @ ww, (c * ww) @ c.T))(cols, w))
