"""Stage-by-stage compile timing for all_1d_densities internals."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops import batched as B

rng = np.random.RandomState(0)
N, P = 1_000_000, 30
cols = jnp.asarray(rng.standard_normal((P, N)).astype(np.float32))
weights = jnp.asarray(rng.randint(1, 5, N).astype(np.float32))
sigmas = jnp.ones(P, jnp.float32)

def t(label, f, *a):
    t0 = time.perf_counter()
    out = f(*a)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{label}: {time.perf_counter()-t0:.1f}s", flush=True)

ix = jnp.clip((cols * 100).astype(jnp.int32) % 4096, 0, 4095)

@jax.jit
def qhists(ixx, w):
    return jax.vmap(lambda row: B._onehot_hist_1d(row, w, 4096))(ixx)
t("vmap qhist 30x1M->4096", qhists, ix, weights)

@jax.jit
def fhists(ixx, w):
    return jax.vmap(lambda row: B._onehot_hist_1d(row % 1024, w, 1024))(ixx)
t("vmap fine hist 30x1M->1024", fhists, ix, weights)

@jax.jit
def neff(c, w, s):
    return B._neff_kde_batch(c, w, s, B._lag_grid(N))
t("neff lag scan", neff, cols, weights, sigmas)

bins = jnp.abs(jnp.asarray(rng.standard_normal((P, 1024)).astype(np.float32))) + 1
@jax.jit
def isj(b):
    return jax.vmap(B._isj_bandwidth_1d)(b, jnp.full(P, 1e5))
t("vmap isj 1d", isj, bins)

@jax.jit
def smooth_all(b):
    pad = 2048
    k = jnp.arange(pad // 2 + 1, jnp.float32)
    def sm(bb, sig):
        mult = jnp.exp(-2.0 * (np.pi * sig / pad) ** 2 * k**2)
        return jnp.fft.irfft(jnp.fft.rfft(bb, pad) * mult, pad)[:1024]
    return jax.vmap(sm)(b, jnp.full(P, 3.0))
t("vmap smooth", smooth_all, bins)
print("done")
