"""r5 probe: Pallas-routed parity histograms vs the lax.map route, on chip.

Checks BIT-exactness (integer weights -> exact sums in every path) on a
12p x 200k slice for both the static-pairs (tiled) and arbitrary-pairs
(v1) routes, then times the 30p x 1M plain-group histograms both ways.

Run: JAX_ENABLE_X64=1 python scripts/probe_parity_hists_r5.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from getdist_tpu.ops import parity_device as pdev


def main():
    print(f"# backend: {jax.default_backend()}")
    samples, weights = bench.make_chain(200_000, 12, seed=3)
    dev_s = jnp.asarray(samples)
    binmin = samples.min(axis=0) - 0.3
    binmax = samples.max(axis=0) + 0.3
    fw = (binmax - binmin) / 255.0
    ix = pdev.bin_indices(dev_s, jnp.asarray(binmin), jnp.asarray(fw))
    parts = pdev.weight_parts(jnp.asarray(weights, jnp.float32))
    p = 12
    pa = np.array([a for a in range(p) for b in range(a + 1, p)], np.int32)
    pb = np.array([b for a in range(p) for b in range(a + 1, p)], np.int32)

    ref = np.asarray(pdev.group_pair_hists(ix, pa, pb, parts, 256, use_pallas=False))
    got_tiled = np.asarray(pdev.group_pair_hists(ix, pa, pb, parts, 256, use_pallas=True, int8_ok=True))
    print("tiled int8 bit-exact:", np.array_equal(ref, got_tiled))
    got_bf16 = np.asarray(pdev.group_pair_hists(ix, pa, pb, parts, 256, use_pallas=True, int8_ok=False))
    print("tiled bf16 bit-exact:", np.array_equal(ref, got_bf16))

    # arbitrary pair list (every b unique -> v1 route): rows 0..5 vs 6..11
    pa2 = np.arange(6, dtype=np.int32)
    pb2 = np.arange(6, 12, dtype=np.int32)
    ref2 = np.asarray(pdev.group_pair_hists(ix, pa2, pb2, parts, 256, use_pallas=False))
    got2 = np.asarray(pdev.group_pair_hists(ix, pa2, pb2, parts, 256, use_pallas=True, int8_ok=False))
    print("v1-route bit-exact:", np.array_equal(ref2, got2))

    # fractional (but bf16-exact-split) weights: multi-part exactness
    wf = weights + 0.5
    parts_f = pdev.weight_parts(jnp.asarray(wf, jnp.float32))
    print(f"# fractional parts: {len(parts_f)}")
    ref3 = np.asarray(pdev.group_pair_hists(ix, pa2, pb2, parts_f, 256, use_pallas=False))
    got3 = np.asarray(pdev.group_pair_hists(ix, pa2, pb2, parts_f, 256, use_pallas=True, int8_ok=False))
    delta = np.abs(ref3 - got3).max()
    print(f"v1-route fractional max delta: {delta} (reduction-order only)")

    # timing at bench scale
    samples, weights = bench.make_chain(bench.N_SAMPLES, bench.N_PARAMS)
    dev_s = jnp.asarray(samples)
    binmin = samples.min(axis=0) - 0.3
    binmax = samples.max(axis=0) + 0.3
    fw = (binmax - binmin) / 255.0
    ix = pdev.bin_indices(dev_s, jnp.asarray(binmin), jnp.asarray(fw))
    parts = pdev.weight_parts(jnp.asarray(weights, jnp.float32))
    p = bench.N_PARAMS
    pa = np.array([a for a in range(p) for b in range(a + 1, p)], np.int32)
    pb = np.array([b for a in range(p) for b in range(a + 1, p)], np.int32)
    for label, kw in (
        ("lax.map route", dict(use_pallas=False)),
        ("tiled int8 route", dict(use_pallas=True, int8_ok=True)),
    ):
        out = pdev.group_pair_hists(ix, pa, pb, parts, 256, **kw)
        s = float(jnp.sum(out[-1]))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = pdev.group_pair_hists(ix, pa, pb, parts, 256, **kw)
            s += float(jnp.sum(out[-1]))
            times.append(time.perf_counter() - t0)
        print(f"{label}: best {min(times) * 1000:.0f} ms (sync {s:.0f})")


if __name__ == "__main__":
    main()
