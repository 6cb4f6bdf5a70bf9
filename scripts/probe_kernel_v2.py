"""Time pair_histograms kernel v2 (uint8 + fused weight select + block 8192)
against the XLA result for exactness, on the real chip."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from getdist_tpu.ops.pallas_kernels import pair_histograms

rng = np.random.RandomState(0)
N, P = 1_048_576, 30
ix = rng.randint(0, 256, (N, P))
w = rng.randint(1, 5, N).astype(np.float32)
pairs = np.array([(i, j) for i in range(P) for j in range(i + 1, P)], np.int32)
pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
ix8 = jnp.asarray(ix.astype(np.uint8))
ix32 = jnp.asarray(ix.astype(np.int32))
wd = jnp.asarray(w)

def t(label, f, n=3):
    out = f(); s = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        s += float(jnp.sum(f()))
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.0f} ms (sum {s:.0f})", flush=True)

for blk in (8192, 4096, 16384):
    try:
        t(f"v2 uint8 block={blk}", lambda b=blk: pair_histograms(ix8, wd, pa, pb, block=b))
    except Exception as e:
        print(f"v2 uint8 block={blk}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
t("v2 int32 block=8192", lambda: pair_histograms(ix32, wd, pa, pb, block=8192))

# exactness vs numpy on a pair subset
h = np.asarray(pair_histograms(ix8, wd, pa[:3], pb[:3], block=8192))
for k in range(3):
    expect = np.zeros((256, 256))
    np.add.at(expect, (ix[:, pairs[k, 1]], ix[:, pairs[k, 0]]), w)
    assert np.array_equal(h[k], expect), f"pair {k} mismatch"
print("exactness ok", flush=True)
