"""Experiment: does the device f64 2D optimizer twin the host optimizer
on IDENTICAL histograms?

Decides the --parity-tpu architecture (VERDICT round-3 item 3): if
ops.batched._kernel_bandwidth_2d at f64 reproduces
kde_bandwidth.KernelOptimizer2D.get_h() to ~1e-8 on every zoo shape (both
the plain branch and the sheared-residual branch), parity-grade bandwidths
can stay ON DEVICE and the 9.5 s / 114 MB histogram readback through the
2-12 MB/s axon tunnel disappears from the parity-TPU budget.

Run on CPU x64 (the f64 oracle environment): JAX_PLATFORMS=cpu.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from getdist_tpu import kde_bandwidth as kde  # noqa: E402
from getdist_tpu.ops import batched  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
import zoo  # noqa: E402

results = []
for label, shape in zoo.shapes_2d(include_cut_gaussians=True).items():
    mc = shape.MCSamples(10000, random_state=np.random.default_rng(10))
    mc.updateBaseStatistics()
    parx, pary = mc._initParamRanges(0), mc._initParamRanges(1)
    corr, actual = mc._pair_correlation(0, 1, parx, pary)
    fine, _ = mc._degeneracy_adapted_bins(corr, mc.fine_bins_2D)
    ix, sx, xlo, xhi = mc._binSamples(mc.samples[:, 0], parx, fine)
    iy, sy, ylo, yhi = mc._binSamples(mc.samples[:, 1], pary, fine)
    hist, _ = mc._make2Dhist(ix, iy, fine, fine)
    neff = min(mc._get1DNeff(parx, 0), mc._get1DNeff(pary, 1))

    plugin_width = neff ** (-1.0 / 6)
    do_corr = not (parx.has_limits or pary.has_limits)
    seed_t = (min(pary.sigma_range / (yhi - ylo), parx.sigma_range / (xhi - xlo)) * plugin_width) ** 2

    # the branch getAutoBandwidth2D would take
    both_limited = parx.has_limits and pary.has_limits
    if abs(corr) > mc.max_corr_2D or (both_limited and corr > 0.8):
        branch = "rule"
    elif abs(corr) > 0.2 and not both_limited:
        branch = "sheared"
    else:
        branch = "plain"

    def compare(tag, h2d, n_eff, c_in, do_c, fb_t):
        try:
            opt = kde.KernelOptimizer2D(h2d, n_eff, c_in, do_correlation=do_c, fallback_t=fb_t)
            host = opt.get_h()
        except ValueError as e:
            host = ("FAIL", str(e))
        wx, wy, ck, ok, fragile = (
            np.asarray(v)
            for v in batched._kernel_bandwidth_2d(
                jax.numpy.asarray(np.asarray(h2d, np.float64)),
                jax.numpy.float64(n_eff),
                jax.numpy.float64(c_in),
                bool(do_c),
                fallback_t=jax.numpy.float64(fb_t) if fb_t is not None else None,
            )
        )
        if isinstance(host[0], str):
            print(f"{label:18s} {tag:8s} host FAIL ({host[1][:40]}); device ok={ok} fragile={fragile}")
            return
        hx, hy, hc = host
        rel = max(abs(wx - hx) / hx, abs(wy - hy) / hy)
        dc = abs(ck - hc)
        results.append((label, tag, rel, dc, bool(fragile)))
        flag = " <-- DIVERGES" if rel > 1e-6 or dc > 1e-6 else ""
        print(f"{label:18s} {tag:8s} rel_w={rel:.2e} dcorr={dc:.2e} fragile={bool(fragile)}{flag}")

    if branch == "plain":
        compare("plain", hist, neff, corr, do_corr, seed_t)
    elif branch == "sheared":
        # host sheared branch: optimizer on the re-binned residual hist at corr 0
        lead_par, other = (pary, 0) if pary.has_limits else (parx, 1)
        lead = 1 if pary.has_limits else 0
        pair_cov = mc.getCov(pars=[lead, other])
        root = np.linalg.cholesky(pair_cov)
        resid = (root[0, 0] * mc.samples[:, other] - root[1, 0] * mc.samples[:, lead]) / root[1, 1]
        bl = lead_par.range_min if lead_par.has_limits_bot else None
        bh = lead_par.range_max if lead_par.has_limits_top else None
        ix_l = kde.bin_samples(mc.samples[:, lead], nbins=mc.fine_bins_2D, range_min=bl, range_max=bh)[0]
        ix_r = kde.bin_samples(resid, nbins=mc.fine_bins_2D)[0]
        sheared_hist, _ = mc._make2Dhist(ix_l, ix_r, mc.fine_bins_2D, mc.fine_bins_2D)
        compare("sheared", sheared_hist, neff, 0.0, do_corr, None)
    else:
        print(f"{label:18s} rule branch (no optimizer)")

worst = max((r[2] for r in results), default=0)
worst_c = max((r[3] for r in results), default=0)
n_div = sum(1 for r in results if r[2] > 1e-6 or r[3] > 1e-6)
print(f"\nworst rel_w {worst:.2e}; worst dcorr {worst_c:.2e}; divergent {n_div}/{len(results)}")
