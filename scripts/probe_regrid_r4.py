#!/usr/bin/env python
"""Round-4 probe: fine-grained breakdown of _fast_regrid_pairs at bench
scale on TPU — host per-pair work vs device program vs transfer."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import N_PARAMS, N_SAMPLES, make_chain


def main():
    samples, weights = make_chain(N_SAMPLES, N_PARAMS)
    names = [f"p{i}" for i in range(N_PARAMS)]

    from getdist_tpu.mcsamples import MCSamples

    mc = MCSamples(samples=samples, weights=weights, names=names)
    mc.updateBaseStatistics()
    mc.getCorrelationMatrix()

    from getdist_tpu.ops import batched
    import jax.numpy as jnp

    # run the fused program once to get d1/d2 the way fastTriangleDensities does
    t0 = time.perf_counter()
    d1, d2 = batched.triangle_densities(mc.samples, mc.weights, contours=(0.68, 0.95))
    frag = np.asarray(d2["fragile"])
    print(f"fused program (cold, incl upload): {time.perf_counter() - t0:.2f}s; fragile: {frag.sum()}")

    idx = list(range(mc.n))
    pairs = [(a, b) for a in range(mc.n) for b in range(a + 1, mc.n)]

    # time the internals of _fast_regrid_pairs by replicating its skeleton
    corr = np.asarray(mc.getCorrelationMatrix())
    t0 = time.perf_counter()
    step = max(1, mc.samples.shape[0] // 200000)
    sub = mc.samples[::step]
    wn = np.asarray(mc.weights[::step], float)
    wn = wn / wn.sum()
    zc = sub - wn @ sub
    zc = zc / np.sqrt(wn @ (zc * zc))
    z2, z3 = zc * zc, zc**3
    rho_z = (zc * wn[:, None]).T @ zc
    k31 = (z3 * wn[:, None]).T @ zc - 3 * rho_z
    k22 = (z2 * wn[:, None]).T @ z2 - 1 - 2 * rho_z**2
    cum_score = np.abs(k31) + np.abs(k31.T) + np.abs(k22)
    print(f"cum_score pass: {time.perf_counter() - t0:.2f}s")

    # which pairs assist?
    max_corr = 0.95
    assist_pairs = [(a, b) for (a, b) in pairs if 0.5 <= abs(corr[a, b]) <= max_corr]
    frag_pairs = [
        (a, b) for k, (a, b) in enumerate(pairs)
        if frag[k] and cum_score[a, b] > 0.25 and not (0.5 <= abs(corr[a, b]) <= max_corr)
    ]
    print(f"assist pairs: {len(assist_pairs)}, fragile pairs: {len(frag_pairs)}")

    # host work per assist pair
    t0 = time.perf_counter()
    for a, b in assist_pairs:
        mc._initParamRanges(a)
    t_ranges = time.perf_counter() - t0
    print(f"_initParamRanges for assist pairs: {t_ranges:.2f}s")

    neff_h = np.asarray(d1["neff"])
    t0 = time.perf_counter()
    for a, b in assist_pairs:
        parx = mc._initParamRanges(a)
        pary = mc._initParamRanges(b)
        pair_neff = float(min(neff_h[a], neff_h[b]))
        t1 = time.perf_counter()
        wx_d, wy_d, cc = mc._optimize_bandwidth_sheared(parx, pary, a, b, pair_neff, 256)
        print(f"  pair ({a},{b}): _optimize_bandwidth_sheared {time.perf_counter() - t1:.2f}s")
    print(f"assist host total: {time.perf_counter() - t0:.2f}s")

    # device regrid program (the all_2d_densities rerun), timed separately:
    # cold then warm
    plist = assist_pairs
    pa = jnp.asarray(np.array([a for a, _ in plist], np.int32))
    pb = jnp.asarray(np.array([b for _, b in plist], np.int32))
    for use_pallas in (False, True):
        for it in range(2):
            t0 = time.perf_counter()
            d2x = batched.all_2d_densities(
                mc.samples, mc.weights, pa, pb,
                d1["neff"], d1["range"][0], d1["range"][1],
                jnp.asarray(np.array([0.68, 0.95], np.float32)),
                fine_bins=256, use_pallas=use_pallas,
                sigma_range=d1["sigma_range"], max_corr=max_corr, winw=30,
            )
            s = float(np.asarray(d2x["P"]).sum())
            print(f"regrid program use_pallas={use_pallas} run{it}: {time.perf_counter() - t0:.2f}s (sync {s:.1f})")


if __name__ == "__main__":
    main()
