"""Deterministic Planck-scale chain synthesis for integration tests.

Generates a realistic 27-parameter, 4-chain MCMC run (correlated AR(1)
walk over a degenerate covariance, integer multiplicities, chi^2-like
loglikes, bounded parameters) plus sidecar .paramnames/.ranges files --
the role of the reference CI's getdist_testchains clone
(reference .github/workflows/tests.yml:56, tests/getdist_test.py:464-503),
synthesized instead of downloaded.
"""

import numpy as np

NP = 27
NCHAIN = 4
NSAMP = 12000

NAMES = [
    "omegabh2", "omegach2", "theta", "tau", "logA", "ns",
    "calPlanck", "acib217", "xi", "asz143", "aps100", "aps143",
    "aps217", "aksz", "kgal100", "kgal143", "kgal217", "galf_EE_A_100",
    "galf_EE_A_143", "galf_EE_A_217", "galf_TE_A_100", "galf_TE_A_143",
    "galf_TE_A_217", "H0", "omegal", "sigma8", "age",
]
LABELS = [f"p_{{{i}}}" for i in range(NP)]
# hard bounds: tau > 0.01, xi in [0, 1], amplitudes > 0
RANGES = {"tau": (0.01, None), "xi": (0.0, 1.0), "aksz": (0.0, None)}
MEANS = np.linspace(-1.0, 2.0, NP) * np.arange(1, NP + 1) % 3.0
MEANS[3] = 0.055  # tau near its bound
MEANS[8] = 0.15   # xi near zero
MEANS[13] = 0.6   # aksz


def _covariance(rng):
    a = rng.standard_normal((NP, NP)) * 0.25 + np.eye(NP)
    cov = a @ a.T
    d = np.sqrt(np.diag(cov))
    corr = cov / np.outer(d, d)
    # one tight degeneracy pair (like omegam-sigma8)
    corr[24, 25] = corr[25, 24] = 0.93
    # re-positive-definite
    w, v = np.linalg.eigh(corr)
    corr = (v * np.maximum(w, 0.05)) @ v.T
    d2 = np.sqrt(np.diag(corr))
    corr = corr / np.outer(d2, d2)
    sig = 0.02 + 0.2 * rng.random(NP)
    sig[3] = 0.02  # tau
    sig[8] = 0.12  # xi
    sig[13] = 0.35  # aksz
    return corr * np.outer(sig, sig)


def generate(base, seed=20260816):
    """Write chains + sidecars under base (a pathlib dir); returns root."""
    rng = np.random.default_rng(seed)
    cov = _covariance(rng)
    L = np.linalg.cholesky(cov)
    icov = np.linalg.inv(cov)
    root = str(base / "planck_like")
    lo = np.full(NP, -np.inf)
    hi = np.full(NP, np.inf)
    for k, (a, b) in RANGES.items():
        i = NAMES.index(k)
        lo[i] = a if a is not None else -np.inf
        hi[i] = b if b is not None else np.inf
    for c in range(NCHAIN):
        x = np.empty((NSAMP, NP))
        state = MEANS + rng.standard_normal(NP) @ L.T
        rho, fac = 0.92, np.sqrt(1 - 0.92**2)
        rows = []
        for _ in range(NSAMP):
            prop = MEANS + rho * (state - MEANS) + fac * (rng.standard_normal(NP) @ L.T)
            # reflect at hard bounds so the truncated shape is realistic
            prop = np.where(prop < lo, 2 * lo - prop, prop)
            prop = np.where(prop > hi, 2 * hi - prop, prop)
            state = prop
            rows.append(state.copy())
        x = np.array(rows)
        dx = x - MEANS
        loglike = 0.5 * np.einsum("ni,ij,nj->n", dx, icov, dx)
        weights = rng.integers(1, 7, NSAMP).astype(float)
        table = np.column_stack([weights, loglike, x])
        np.savetxt(f"{root}_{c + 1}.txt", table, fmt="%.8e")
    with open(root + ".paramnames", "w", encoding="utf-8") as f:
        for name, label in zip(NAMES, LABELS):
            f.write(f"{name}\t{label}\n")
    with open(root + ".ranges", "w", encoding="utf-8") as f:
        for k, (a, b) in RANGES.items():
            f.write(f"{k} {a if a is not None else 'N'} {b if b is not None else 'N'}\n")
    with open(root + ".properties.ini", "w", encoding="utf-8") as f:
        f.write("burn_removed = T\n")
    return root
