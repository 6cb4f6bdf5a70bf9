"""Attribute all_1d_densities time by stage knockouts (hoisted jits)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops import batched as B

rng = np.random.RandomState(0)
N, P = 1_000_000, 30
s = jnp.asarray(rng.standard_normal((N, P)).astype(np.float32))
w = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))

def t(label, f, n=5):
    out = f(); sm = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(); sm += float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: med {sorted(ts)[len(ts)//2]*1000:.1f} ms", flush=True)

cols = s.T
fine = 1024
mins = jnp.min(cols, axis=1); maxs = jnp.max(cols, axis=1)
width = (maxs - mins) / (fine - 1)
ix = jnp.clip((((cols - mins[:, None]) / width[:, None]) + 0.5).astype(jnp.int32), 0, fine - 1)
sd = jnp.std(cols, axis=1)
lags = B._lag_grid(N)
lags4 = B._lag_grid(N // 4)

hist_j = jax.jit(B._onehot_hist_rows, static_argnums=2)
neff_j = jax.jit(lambda c, ww, ss: B._neff_kde_batch(c, ww, ss, lags))
neff4_j = jax.jit(lambda c, ww, ss: B._neff_kde_batch(c, ww, ss, lags4))
mom_j = jax.jit(lambda c, ww: (c @ ww, (c * ww) @ c.T))
minmax_j = jax.jit(lambda c: (jnp.min(c, axis=1), jnp.max(c, axis=1)))

t("full all_1d", lambda: B.all_1d_densities(s, w))
t("hist rows only", lambda: hist_j(ix, w, fine))
t("neff kde batch", lambda: neff_j(cols, w, sd))
t("neff kde 1/4 subsample", lambda: neff4_j(cols[:, :N // 4], w[:N // 4], sd))
t("moments", lambda: mom_j(cols, w))
t("minmax", lambda: minmax_j(cols))
