#!/usr/bin/env python
"""Benchmark: all-pairs triangle densities for a 30-param, 1M-sample chain.

The BASELINE.json headline workload: 30 x 1D + 435 x 2D marginalized KDE
densities of a weighted MCMC chain, via the fused device pipeline
(getdist_tpu.ops.batched). Prints ONE JSON line:

    {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <speedup>}

vs_baseline is the measured speedup over the reference implementation
(cmbant/getdist on CPU). Because the reference needs many minutes at full
size, it is timed on a scaled-down config (SCALE_P params, SCALE_N samples)
and extrapolated linearly in (number of pairs x samples); the scaling basis
is printed on stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PARAMS = 30
N_SAMPLES = 1_000_000
SCALE_P = 6
SCALE_N = 100_000
REFERENCE_PATH = "/root/reference"


def make_chain(n, p, seed=7):
    """Planck-like correlated chain: AR(1)-correlated walk over a random
    covariance, integer weights."""
    rng = np.random.RandomState(seed)
    A = rng.standard_normal((p, p)) * 0.3 + np.eye(p)
    cov = A @ A.T
    L = np.linalg.cholesky(cov)
    steps = rng.standard_normal((n, p)) @ L.T
    rho = 0.8
    x = np.empty((n, p), np.float64)
    x[0] = steps[0]
    fac = np.sqrt(1 - rho**2)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + fac * steps[i]
    weights = rng.randint(1, 5, n).astype(np.float64)
    return x, weights


def run_ours(samples, weights, repeats=3):
    print("# compiling + first run (cold start can take minutes on the axon tunnel)...", file=sys.stderr)
    import jax
    import jax.numpy as jnp

    from getdist_tpu.ops import batched

    dev_s, dev_w = batched.prepare_chain(samples, weights)
    use_pallas = jax.default_backend() != "cpu"
    int8_weights = bool(np.all(weights == np.round(weights)) and weights.min() >= 0 and weights.max() <= 127)
    p = dev_s.shape[1]
    pairs = np.array([(i, j) for i in range(p) for j in range(i + 1, p)], np.int32)
    pa = jnp.asarray(pairs[:, 0])
    pb = jnp.asarray(pairs[:, 1])
    contours = jnp.asarray(np.array([0.68, 0.95], np.float32))

    static_pairs = tuple(map(tuple, pairs.tolist())) if use_pallas else None

    def full():
        # single fused program = single device dispatch
        return batched._triangle_program(
            dev_s, dev_w, pa, pb, contours, None, None, None,
            256, use_pallas, static_pairs, int8_weights, False,
            enable_shear=batched._sniff_shear(samples, 0.95),
        )

    # compile + settle (block_until_ready is unreliable through the axon
    # tunnel: force a host readback of data depending on everything)
    d1, d2 = full()
    sync = float(jnp.sum(d1["P"]) + jnp.sum(d2["P"]) + jnp.sum(d2["contours"]))
    print("# compiled; timing warm runs", file=sys.stderr)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        d1, d2 = full()
        sync += float(jnp.sum(d2["P"][-1]) + jnp.sum(d1["P"][-1]))
        times.append(time.perf_counter() - t0)
    return min(times), sync


def run_reference(samples, weights):
    sys.path.insert(0, REFERENCE_PATH)
    import getdist.chains as ref_chains

    ref_chains.print_load_details = False
    from getdist.mcsamples import MCSamples as RefMCSamples

    names = [f"p{i}" for i in range(samples.shape[1])]
    t0 = time.perf_counter()
    mc = RefMCSamples(samples=samples, weights=weights, names=names)
    for i in range(samples.shape[1]):
        mc.get1DDensityGridData(i)
    for i in range(samples.shape[1]):
        for j in range(i + 1, samples.shape[1]):
            mc.get2DDensityGridData(i, j)
    return time.perf_counter() - t0


def main():
    full_samples, full_weights = make_chain(N_SAMPLES, N_PARAMS)

    ours_s, _ = run_ours(full_samples, full_weights)
    n_pairs_full = N_PARAMS * (N_PARAMS - 1) // 2

    # reference on the scaled config, extrapolated by pair-count x samples
    # (median of 3 runs: single-run CPU timing varies ~30%)
    ref_small = sorted(
        run_reference(full_samples[:SCALE_N, :SCALE_P].copy(), full_weights[:SCALE_N].copy()) for _ in range(3)
    )[1]
    n_pairs_small = SCALE_P * (SCALE_P - 1) // 2
    scale = (n_pairs_full / n_pairs_small) * (N_SAMPLES / SCALE_N)
    ref_extrapolated = ref_small * scale
    print(
        f"# ours full: {ours_s * 1000:.1f} ms | reference {SCALE_P}p/{SCALE_N}: "
        f"{ref_small:.2f} s -> extrapolated full: {ref_extrapolated:.1f} s (scale {scale:.0f})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "all-pairs 1D+2D KDE densities, 30 params x 1M weighted samples",
                "value": round(ours_s * 1000, 2),
                "unit": "ms",
                "vs_baseline": round(ref_extrapolated / ours_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
