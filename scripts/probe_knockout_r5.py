"""r5 knockout: where does the current all_2d program's time go?

Times all_2d_densities warm with individual stages knocked out via its
own hooks (hists_in skips binning, bandwidth_override skips the
optimizer, mult_bias_order=0 skips the bias round, enable_shear=False
skips the NUDFT), all in ONE session so deltas cancel chip drift.

Run: python scripts/probe_knockout_r5.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from getdist_tpu.ops import batched as B

REPS = 4


def main():
    print(f"# backend: {jax.default_backend()}")
    samples, weights = bench.make_chain(bench.N_SAMPLES, bench.N_PARAMS)
    dev_s, dev_w = B.prepare_chain(samples, weights)
    p = dev_s.shape[1]
    pairs = np.array([(i, j) for i in range(p) for j in range(i + 1, p)], np.int32)
    pa, pb = jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])
    contours = jnp.asarray(np.array([0.68, 0.95], np.float32))
    static_pairs = tuple(map(tuple, pairs.tolist()))
    shear = B._sniff_shear(samples, 0.95, pairs=pairs, weights=weights)
    d1 = B.all_1d_densities(dev_s, dev_w)
    base_kw = dict(
        fine_bins=256, use_pallas=True, static_pairs=static_pairs, int8_weights=True,
        sigma_range=d1["sigma_range"], enable_shear=shear,
    )
    args = (dev_s, dev_w, pa, pb, d1["neff"], d1["range"][0], d1["range"][1], contours)

    full0 = B.all_2d_densities(*args, **base_kw)
    hists = B.all_2d_densities(*args, export_hists=True, **base_kw)["hists"]
    k = int(hists.shape[0])
    bw = (
        jnp.full((k,), 0.05, jnp.float32),
        jnp.full((k,), 0.05, jnp.float32),
        jnp.zeros((k,), jnp.float32),
    )

    configs = {
        "full": lambda: B.all_2d_densities(*args, **base_kw),
        "no_hist (hists_in)": lambda: B.all_2d_densities(*args, hists_in=hists, **base_kw),
        "no_optimizer (override)": lambda: B.all_2d_densities(*args, bandwidth_override=bw, **base_kw),
        "no_bias": lambda: B.all_2d_densities(*args, mult_bias_order=0, **base_kw),
        "no_shear": lambda: B.all_2d_densities(
            *args, **{**base_kw, "enable_shear": False}
        ),
        "hists_only": lambda: {"P": B.all_2d_densities(*args, export_hists=True, **base_kw)["hists"]},
    }
    # compile all
    s = 0.0
    outs = {}
    for label, fn in configs.items():
        outs[label] = fn()
        s += float(jnp.sum(outs[label]["P"][-1]))
    print("# compiled; interleaved timing")
    times = {label: [] for label in configs}
    for _ in range(REPS):
        for label, fn in configs.items():
            t0 = time.perf_counter()
            out = fn()
            s += float(jnp.sum(out["P"][-1]))
            times[label].append(time.perf_counter() - t0)
    best = {label: min(ts) for label, ts in times.items()}
    for label, t in best.items():
        print(f"{label}: {t * 1000:7.1f} ms")
    full = best["full"]
    for label in ("no_hist (hists_in)", "no_optimizer (override)", "no_bias", "no_shear"):
        print(f"delta {label}: {(full - best[label]) * 1000:6.1f} ms")
    print(f"# sync {s:.3e}")


if __name__ == "__main__":
    main()
