"""r5 probe: parity-TPU N_eff stage attribution on the real chip.

Times, separately: the batched device ACL (one f32 FFT pass), and the
kde_neff_batch lag-term dispatches, on the exact bench chain.

Run: JAX_ENABLE_X64=1 python scripts/probe_neff_r5.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from getdist_tpu.mcsamples import MCSamples
from getdist_tpu.ops import parity_device as pdev


def main():
    print(f"# backend: {jax.default_backend()}")
    samples, weights = bench.make_chain(bench.N_SAMPLES, bench.N_PARAMS)
    mc = MCSamples(samples=samples, weights=weights, names=[f"p{i}" for i in range(bench.N_PARAMS)])
    means, variances = mc.getMeans(), mc.getVars()
    dev_s32 = jnp.asarray(mc.samples, jnp.float32)
    dev_w32 = jnp.asarray(mc.weights, jnp.float32)
    dev_s64 = jnp.asarray(mc.samples)
    dev_w64 = jnp.asarray(mc.weights)
    cols = list(range(bench.N_PARAMS))
    maxlag = mc.numrows // 10 + 1

    acl, safe = pdev.acl_batch(dev_s32, dev_w32, means, variances, cols, maxlag)  # compile
    for label in ("acl_batch warm1", "acl_batch warm2"):
        t0 = time.perf_counter()
        acl, safe = pdev.acl_batch(dev_s32, dev_w32, means, variances, cols, maxlag)
        print(f"{label}: {time.perf_counter() - t0:.2f}s safe={int(safe.sum())}/{len(cols)}")

    maxoffs = [min(4 + int(1.5 * a), mc.numrows // 10) for a in acl]
    kstds = [0.2 * float(np.sqrt(v)) for v in variances]  # ~sigma_range scale
    print(f"# maxoffs: min {min(maxoffs)} max {max(maxoffs)}")

    t0 = time.perf_counter()
    n_den = pdev.kde_neff_batch(dev_s64, dev_w64, mc.weights, kstds, maxoffs, mc.numrows, col_ix=cols)
    print(f"kde_neff_batch cold (incl. compile): {time.perf_counter() - t0:.2f}s")
    for label in ("kde_neff_batch warm1", "kde_neff_batch warm2"):
        t0 = time.perf_counter()
        n_den = pdev.kde_neff_batch(dev_s64, dev_w64, mc.weights, kstds, maxoffs, mc.numrows, col_ix=cols)
        print(f"{label}: {time.perf_counter() - t0:.2f}s (n_den[0]={n_den[0]:.3e})")

    # how many lag jobs does the driver actually evaluate?
    coarse = sum(len(list(_coarse(m))) for m in maxoffs)
    print(f"# dispatch-1 jobs: {len(cols) * 7 + coarse} (7 base/param + {coarse} coarse probes)")


def _coarse(maxoff):
    h = int(maxoff)
    while h > 10:
        yield h // 3
        h //= 3


if __name__ == "__main__":
    main()
