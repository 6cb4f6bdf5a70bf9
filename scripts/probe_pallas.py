"""Time the Pallas pair-histogram kernel on the real chip vs XLA one-hot."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops.pallas_kernels import pair_histograms
from getdist_tpu.ops import batched as B

rng = np.random.RandomState(0)
P, N, K = 30, 1_000_000, 435
Npad = ((N + 4095) // 4096) * 4096
ix = np.zeros((P, Npad), np.int32)
ix[:, :N] = rng.randint(0, 256, (P, N))
w = np.zeros(Npad, np.float32)
w[:N] = rng.randint(1, 5, N)
ix = jnp.asarray(ix); w = jnp.asarray(w)
ixt = jnp.asarray(np.ascontiguousarray(np.asarray(ix).T))
pairs = np.array([(i, j) for i in range(P) for j in range(i + 1, P)], np.int32)
pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])

def t(label, f, *a, n=3):
    out = f(*a); s = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a); s += float(jnp.sum(out))
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.0f} ms (sum {s:.3g})", flush=True)
    return out

h_pallas = t("pallas pair hists 435", lambda a, b: pair_histograms(ixt, w, a, b), pa, pb)

@jax.jit
def xla_hists(a, b):
    return jax.lax.map(lambda ab: B._pair_hist_256(ix[ab[0]], ix[ab[1]], w), (a, b))
h_xla = t("xla one-hot 435", xla_hists, pa, pb)
print("match:", bool(jnp.all(jnp.abs(h_pallas - h_xla) < 0.5)))
