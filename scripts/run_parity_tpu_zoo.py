"""Measure the device parity mode's grids on REAL TPU hardware against the
host (CPU f64) parity pipeline over the full reference distribution zoo.

Two phases because the two backends cannot share a process:

    python scripts/run_parity_tpu_zoo.py            # on TPU: writes npz
    python scripts/run_parity_tpu_zoo.py --compare  # on CPU: prints table

The acceptance bar (VERDICT round-3 item 3): every 2D grid within 1e-5 of
the parity pipeline (itself 1.9e-7 worst-case against the reference
oracle). 1D densities ride the identical host path in both modes, so they
must be exact.
"""

import os
import sys

import numpy as np

import jax

NPZ = "/tmp/parity_tpu_zoo.npz"
NSAMP = 10000


def shapes():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    import zoo

    return zoo.shapes_2d(include_cut_gaussians=True)


def main():
    compare = "--compare" in sys.argv
    if compare:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if not compare:
        out = {}
        for label, shape in shapes().items():
            mc = shape.MCSamples(NSAMP, random_state=np.random.default_rng(10))
            d1, d2 = mc.fastParityDensities(device=True)
            g = d2[("x", "y")]
            out[label + "/P"] = g.P
            out[label + "/contours"] = np.asarray(g.contours)
            out[label + "/x1"] = d1["x"].P
            print(label, "ok", flush=True)
        np.savez(NPZ, **out)
        print("saved", NPZ)
        return

    tpu = np.load(NPZ)
    worst = (0.0, "")
    print(f"{'shape':22s} {'max|dP| 2D':>12s} {'d contours':>12s} {'d 1D':>10s}")
    for label, shape in shapes().items():
        if label + "/P" not in tpu:
            print(f"{label:22s} (missing from TPU run)")
            continue
        mc = shape.MCSamples(NSAMP, random_state=np.random.default_rng(10))
        d1, d2 = mc.fastParityDensities()
        g = d2[("x", "y")]
        gp = g.P / g.P.max()
        tp = tpu[label + "/P"]
        tp = tp / tp.max()
        d = float(np.abs(gp - tp).max())
        dc = float(np.abs(np.asarray(g.contours) - tpu[label + "/contours"]).max())
        d1d = float(np.abs(d1["x"].P - tpu[label + "/x1"]).max())
        if d > worst[0]:
            worst = (d, label)
        print(f"{label:22s} {d:12.3e} {dc:12.3e} {d1d:10.3e}")
    print(f"\nWORST 2D: {worst[0]:.3e} ({worst[1]}); bar: <= 1e-5")


if __name__ == "__main__":
    main()
