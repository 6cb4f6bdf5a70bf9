#!/usr/bin/env python
"""Round-4 probe: where does the PUBLIC fastTriangleDensities path spend
its time at bench scale (30p x 1M, correlated int-weight chain) on TPU?

The round-3 verdict measured the public path at 8.7x the program-only time
on a CPU slice; this measures the full-scale TPU breakdown so the gap can
be closed where it actually is.
"""

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

    t0 = time.perf_counter()
    mc = MCSamples(samples=samples, weights=weights, names=names)
    t_ctor = time.perf_counter() - t0
    t0 = time.perf_counter()
    mc.updateBaseStatistics()
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    mc.getCorrelationMatrix()
    t_corr = time.perf_counter() - t0
    print(f"ctor {t_ctor:.3f}s  updateBaseStatistics {t_base:.3f}s  corr {t_corr:.3f}s", flush=True)

    # instrument the stages by monkey-patching timers around the rescue passes
    stages = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t = time.perf_counter()
            out = fn(*a, **k)
            stages[name] = stages.get(name, 0.0) + time.perf_counter() - t
            return out
        return wrap

    mc._fast_regrid_plan = timed("regrid_plan", mc._fast_regrid_plan)
    mc._fast_regrid_exec = timed("regrid_exec", mc._fast_regrid_exec)
    mc._fast_rescue_clamped_pairs = timed("clamped", mc._fast_rescue_clamped_pairs)
    mc._fast_rescue_wide_bounded_1d = timed("wide1d", mc._fast_rescue_wide_bounded_1d)

    from getdist_tpu.ops import batched
    batched.all_1d_densities = timed("prog_1d_dispatch", batched.all_1d_densities)
    batched.all_2d_densities = timed("prog_2d_dispatch", batched.all_2d_densities)

    for it in range(3):
        stages.clear()
        t0 = time.perf_counter()
        d1, d2, pairs = mc.fastTriangleDensities()
        total = time.perf_counter() - t0
        # force readback
        s = float(np.asarray(d1["P"]).sum()) + float(np.asarray(d2["P"]).sum())
        t_sync = time.perf_counter() - t0
        n_regrid = len(d2.get("regrid", {}))
        print(
            f"run {it}: total {total:.3f}s  synced {t_sync:.3f}s  stages: "
            + "  ".join(f"{k} {v:.3f}s" for k, v in stages.items())
            + f"  (regrid pairs: {n_regrid}, sync {s:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
