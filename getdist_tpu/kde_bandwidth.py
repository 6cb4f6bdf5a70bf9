"""Kernel bandwidth selection: Botev Improved Sheather-Jones (ISJ).

Implements the ISJ plug-in bandwidth of Botev, Grotowski & Kroese (2010,
Annals of Statistics 38:2916, arXiv:1011.2602) in 1D, and the 2D extension
with kernel-correlation estimation and numerical AMISE minimization used by
the reference (``getdist/kde_bandwidth.py``).

Architecture note: this module is the *parity-exact host path*. Everything
here operates on tiny O(grid) arrays (<= 2048 / 256^2), so it runs host-side
with scipy's DCT and the same scipy root-finders and tolerances as the
reference: the iterative optimizers (fsolve/brentq/TNC) amplify even 1e-16
input perturbations into ~1e-4 bandwidth differences, so bit-identical
transforms are required for 1e-6 density parity (verified empirically). The
fused all-pairs TPU benchmark path instead uses the device DCT and
lax.while_loop bisection (``getdist_tpu.ops.bandwidth``) and is tested to
track this path within KDE tolerance.
"""

import logging
import warnings

import numpy as np

from getdist_tpu.ops.fft import dct2d as dct2d  # re-export (reference kde_bandwidth.py:8)
import scipy.fftpack as _fftpack
from scipy.optimize import brentq, fsolve, minimize

__all__ = ["gaussian_kde_bandwidth_binned", "gaussian_kde_bandwidth", "bin_samples", "KernelOptimizer2D"]

_ROOT_PI = np.sqrt(np.pi)
_PI_SQ = np.pi**2

# Depth of the ISJ functional recursion (number of plug-in stages).
ISJ_LMAX = 7

# Stage constants xi_j = (1 + 2^{-j-1/2})/3 * (2j-1)!! / sqrt(pi/2),
# for j = lmax-1 down to 2 (Botev eq. for the gamma^{[l]} recursion).
_ISJ_STAGE_CONSTS = np.array(
    [
        (1 + 0.5 ** (j + 0.5)) / 3 * np.prod(np.arange(1, 2 * j, 2)) / (_ROOT_PI / np.sqrt(2.0))
        for j in range(ISJ_LMAX - 1, 1, -1)
    ]
)


def _isj_fixed_point_1d(h, N, I, logI, a2):
    """The ISJ fixed-point residual f(h) = h - (2 N sqrt(pi) gamma(h))^{-1/5}.

    ``I`` = squared DCT mode indices, ``a2`` = squared (halved) DCT
    coefficients of the binned density; gamma chains ISJ_LMAX-1 derivative-
    functional estimates down from an initial t = (pi h)^2 smoothing.
    """
    if h <= 0:
        return h - 1
    f = 2 * np.pi ** (2 * ISJ_LMAX) * np.dot(a2, np.exp(ISJ_LMAX * logI - I * (_PI_SQ * h**2)))
    for j, const in zip(range(ISJ_LMAX - 1, 1, -1), _ISJ_STAGE_CONSTS):
        t_j = (const / N / f) ** (2 / (3.0 + 2 * j))
        f = 2 * np.pi ** (2 * j) * np.dot(a2, np.exp(j * logI - I * (_PI_SQ * t_j)))
        if not f:
            raise FloatingPointError("zero functional in ISJ fixed point (non-convergence)")
    return h - (2 * N * _ROOT_PI * f) ** (-1.0 / 5)


def bin_samples(samples, range_min=None, range_max=None, nbins=2046, edge_fac=0.1):
    """Map samples to integer bin indices over an edge-padded range.

    Returns (indices, range_width); the default range pads the data extent
    by edge_fac on each side (reference ``kde_bandwidth.py:76-87``).
    """
    mx = np.max(samples)
    mn = np.min(samples)
    delta = mx - mn
    if range_min is None:
        range_min = mn - delta * edge_fac
    if range_max is None:
        range_max = mx + delta * edge_fac
    width = range_max - range_min
    dx = width / (nbins - 1)
    return ((samples - range_min) / dx).astype(int), width


def gaussian_kde_bandwidth(samples, Neff=None, range_min=None, range_max=None, nbins=2046):
    """ISJ bandwidth for raw (unbinned) samples, in sample units."""
    if Neff is None:
        Neff = np.count_nonzero(np.diff(samples)) + 1
    bins, width = bin_samples(samples, range_min, range_max, nbins)
    data = np.bincount(bins, minlength=nbins)
    h = gaussian_kde_bandwidth_binned(data, Neff)
    return None if h is None else h * width


def gaussian_kde_bandwidth_binned(data, Neff, a=None):
    """Optimal Gaussian kernel bandwidth for binned data, as a fraction of
    the data range, or None on failure (caller falls back to a rule of
    thumb; reference ``kde_bandwidth.py:102-135``).

    Solves the ISJ fixed point with scipy fsolve from the 0.53 N^{-1/5}
    rule-of-thumb start; a suspiciously small root (< 0.019 N^{-1/5})
    triggers a bracketed brentq recheck against the spurious-root regime.
    """
    I = np.arange(1, data.size, dtype=float) ** 2
    logI = np.log(I)
    if a is None:
        a = _fftpack.dct(data / np.sum(data))
    a2 = (a[1:] / 2) ** 2
    try:
        n_scaling = Neff ** (-1.0 / 5)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            hfrac = 0.53 * n_scaling
            hfrac = fsolve(_isj_fixed_point_1d, hfrac, (Neff, I, logI, a2), xtol=hfrac / 20, factor=1)[0]
        if hfrac < 0.019 * n_scaling:
            try:
                hfrac = brentq(_isj_fixed_point_1d, 0.019 * n_scaling, 0.5, (Neff, I, logI, a2), xtol=hfrac / 20)
            except Exception:
                # No sign change in the bracket: the small root may be real
                # (or the method failed, e.g. flat bounded distributions) —
                # keep the fsolve answer, as the reference does.
                pass
        return hfrac
    except Exception as e:
        logging.warning("1D auto bandwidth failed. Using fallback: %s" % e)
        return None


# ---------------------------------------------------------------------------
# 2D
# ---------------------------------------------------------------------------

# K[j] = phi^(2j)(0) values: (-1)^j (2j-1)!! / sqrt(2 pi)
_K_EVEN = np.array(
    [1 / np.sqrt(2 * np.pi)]
    + [(-1) ** j * np.prod(np.arange(1, 2 * j, 2)) / np.sqrt(2 * np.pi) for j in range(1, 5)]
)
# Odd-order kernel constants (for psi_odd recursion)
_K_ODD = np.array([1] + [np.prod(np.arange(1, 2 * j, 2)) / 2.0 ** (j + 1) / np.sqrt(np.pi) for j in range(1, 9)])


class KernelOptimizer2D:
    """2D ISJ bandwidth matrix optimizer with kernel correlation.

    Pipeline (reference ``kde_bandwidth.py:146-309``): squared 2D DCT
    coefficients give even psi functionals, the full FFT power spectrum
    gives odd ones; t* solves the 2D fixed point by brentq; closed-form
    diagonal bandwidths (hx, hy) come from psi(0,2)/psi(2,0)/psi(1,1); then
    numerical AMISE minimization (TNC, bounded) admits kernel correlation c.

    The DCT/FFT transforms are device ops; psi sums are tiny (grid^2) host
    matvecs; optimizer calls stay host-side for exact reference parity.
    """

    def __init__(self, data, Neff, correlation, do_correlation=True, fallback_t=None):
        size = data.shape[0]
        if size != data.shape[1]:
            raise ValueError("KernelOptimizer2D only handles square arrays currently")
        normed = np.asarray(data, dtype=float) / np.sum(data)
        self.a2 = _fftpack.dct(_fftpack.dct(normed, axis=0), axis=1)[1:, 1:] ** 2
        self.I = np.arange(1, size, dtype=np.float64) ** 2
        self.logI = np.log(self.I)
        self.do_correlation = do_correlation
        if do_correlation:
            aFFT = np.fft.fft2(normed)
            self.aFFT = aFFT * np.conj(aFFT)
        self.N = Neff
        self.corr = correlation
        try:
            # t* is the squared moment-estimation bandwidth from the 2D
            # fixed point; with boundaries it can overshoot badly, in which
            # case the plug-in fallback wins (reference :162-175).
            self.t_star = brentq(self._fixed_point_2d, 0, 0.1, xtol=0.001**2)
            if fallback_t and self.t_star > 0.01 and self.t_star > 2 * fallback_t:
                logging.debug("KernelOptimizer2D using fallback (t* > 2*t_fallback)")
                self.t_star = fallback_t
        except Exception:
            if fallback_t is not None:
                logging.debug("2D kernel density optimizer using fallback plugin width %s" % np.sqrt(fallback_t))
                self.t_star = fallback_t
            else:
                raise

    def _fixed_point_2d(self, t):
        sum_func = self.func2d([0, 2], t) + self.func2d([2, 0], t) + 2 * self.func2d([1, 1], t)
        time = (2 * np.pi * self.N * sum_func) ** (-1.0 / 3)
        return (t - time) / time

    def psi(self, s, time):
        """Even psi functional of derivative orders s=(sx, sy) at squared
        bandwidth `time`, from squared DCT coefficients."""
        w = -self.I * (_PI_SQ * time)
        wx = np.exp(w + self.logI * s[0])
        wy = np.exp(w + self.logI * s[1])
        return (-1) ** np.sum(s) * wy.dot(self.a2).dot(wx.T) * np.pi ** (2 * np.sum(s)) / 4

    def func2d(self, s, t):
        """Recursive plug-in estimate of psi(s): bandwidths for low orders
        come from the next-order functionals (Botev recursion, 2D form)."""
        sums = np.sum(s)
        if sums <= 4:
            sum_func = self.func2d([s[0] + 1, s[1]], t) + self.func2d([s[0], s[1] + 1], t)
            const = (1 + 0.5 ** (sums + 1)) / 3
            time = (-2 * const * _K_EVEN[s[0]] * _K_EVEN[s[1]] / self.N / sum_func) ** (1.0 / (2 + sums))
            return self.psi(s, time)
        return self.psi(s, t)

    def psi_odd(self, s, time):
        """Odd psi functional from the full FFT power spectrum (odd DCT
        moments vanish; needs signed frequencies)."""
        f = np.fft.fftfreq(self.aFFT.shape[0], d=1.0 / self.aFFT.shape[0])
        w = np.exp(-(f**2) * (4 * _PI_SQ * time))
        wx = w * f ** s[0]
        wy = w * f ** s[1]
        return wy.dot(self.aFFT).real.dot(wx.T) * (2 * np.pi) ** np.sum(s)

    def func2d_odd(self, s, t):
        """Recursive plug-in estimate for odd-order psi functionals."""
        sums = np.sum(s)
        if sums <= 8:
            sum_func = self.func2d_odd([s[0] + 2, s[1]], t) + self.func2d_odd([s[0], s[1] + 2], t)
            const = 8 * (1 - 2.0 ** (-sums - 1)) / 3.0
            time = (const * self.p00 * _K_ODD[s[0]] * _K_ODD[s[1]] / self.N**2 / sum_func**2) ** (1.0 / (3 + sums))
            return self.psi_odd(s, time)
        return self.psi_odd(s, t)

    def AMISE(self, cov, corr=None):
        """Asymptotic MISE for bandwidths (hx, hy[, c]) using the stored
        psi-functional matrix; raises if the bias form is not positive."""
        hx, hy = cov[0], cov[1]
        c = corr if corr is not None else cov[2]
        var = 1.0 / (4 * np.pi * hx * hy * np.sqrt(1 - c**2) * self.N)
        bias = 0.25 * (
            hx**4 * self.p[4, 0]
            + hy**4 * self.p[0, 4]
            + 2 * hx**2 * hy**2 * self.p[2, 2] * (2 * c**2 + 1)
            + 4 * c * hx * hy * (hx**2 * self.p[3, 1] + hy**2 * self.p[1, 3])
        )
        if bias < 0:
            raise FloatingPointError("bias not positive definite")
        return var + bias

    def get_h(self, do_correlation=None):
        """(hx, hy, c): closed-form diagonal widths, then AMISE-optimized
        correlated kernel when it clearly wins (reference :234-306)."""
        if do_correlation is None:
            do_correlation = self.do_correlation
        tpsi = self.t_star
        p_02 = self.func2d([0, 2], tpsi)
        p_20 = self.func2d([2, 0], tpsi)
        p_11 = self.func2d([1, 1], tpsi)
        h_x = (p_02 ** (3.0 / 4) / (4 * np.pi * self.N * p_20 ** (3.0 / 4) * (p_11 + np.sqrt(p_20 * p_02)))) ** (
            1.0 / 6
        )
        h_y = (p_20 ** (3.0 / 4) / (4 * np.pi * self.N * p_02 ** (3.0 / 4) * (p_11 + np.sqrt(p_20 * p_02)))) ** (
            1.0 / 6
        )
        corr = 0
        if not do_correlation:
            return h_x, h_y, corr

        p = np.zeros((5, 5))
        p[0, 4] = p_02
        p[4, 0] = p_20
        p[2, 2] = p_11
        p[0, 0] = self.func2d([0, 0], tpsi)
        self.p00 = p[0, 0]
        p[1, 3] = self.func2d_odd([1, 3], tpsi)
        p[3, 1] = self.func2d_odd([3, 1], tpsi)
        self.p = p

        best = self.AMISE(np.array([h_x, h_y, 0]))
        if self.corr:
            try:
                res = minimize(
                    self.AMISE,
                    np.array([h_x, h_y]) / np.sqrt(1 - abs(self.corr)),
                    (self.corr,),
                    method="TNC",
                    bounds=[(0.001, 0.3), (0.001, 0.3)],
                )
                if res.success:
                    fixed_corr_amise = self.AMISE(res.x, self.corr)
                    if fixed_corr_amise < best:
                        h_x, h_y = res.x
                        corr = self.corr
                        best = fixed_corr_amise
            except Exception:
                logging.debug("AMISE fixed correlation optimization failed")
        try:
            res = minimize(
                self.AMISE,
                np.array([h_x, h_y, self.corr]),
                (None,),
                method="TNC",
                bounds=[(0.001, 0.3), (0.001, 0.3), (-0.99, 0.99)],
            )
            if res.success:
                free_amise = self.AMISE(res.x)
                if free_amise < best * 0.9:
                    h_x, h_y, corr = res.x
        except Exception:
            logging.debug("AMISE optimization failed")
        return h_x, h_y, corr

    def get_hdiag(self):
        """Diagonal-only bandwidths (no kernel correlation)."""
        return self.get_h(do_correlation=False)
