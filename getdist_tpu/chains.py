"""Weighted sample containers and multi-chain management.

Getdist-compatible API (reference ``getdist/chains.py``) over a TPU-native
core: chain arrays live as device (JAX) arrays for the heavy statistics —
weighted moments are MXU matmuls, confidence limits device sorts, the
KDE effective-sample estimators device lag kernels (``getdist_tpu.ops.stats``)
— while file discovery, name indexing and mutation (thin/filter/burn) stay
host-side numpy, where data-dependent shapes are natural.

Design difference from the reference: instead of caching per-parameter
Python vectors, a device-array cache of (samples, weights, loglikes) is kept
per object and invalidated on mutation; all per-parameter work is batched.
"""

import os
import pickle
import re
from collections import namedtuple
from collections.abc import Sequence
from copy import deepcopy
from warnings import warn

import numpy as np

import jax.numpy as jnp

from getdist_tpu.ops import autoConvolve
from getdist_tpu.ops.fft import next_fast_len as _np_next_fast_len
from getdist_tpu.ops import stats as _stats
from getdist_tpu.paramnames import ParamInfo, ParamNames, escapeLatex

# Whether to print chain names and burn-in details when loading from file.
print_load_details = True

# Per-call statistics (autocorrelation FFTs, adaptive-lag N_eff terms, sorts)
# run on the host by default: each is a one-shot op where a device dispatch
# (plus possible remote jit compile) costs far more than the computation.
# GETDIST_TPU_DEVICE_OPS=1 forces the device kernels (useful when the
# accelerator is local). Bulk fused pipelines are always device-resident.
_use_device_ops = bool(os.environ.get("GETDIST_TPU_DEVICE_OPS"))


def _autoconvolve_host(d, n):
    """Host twin of ops.autoConvolve with normalize=True: each lag k is
    divided by its number of overlapping terms (reference convolve.py:477)."""
    s = _np_next_fast_len(2 * d.shape[0])
    spec = np.fft.rfft(d, s)
    res = np.fft.irfft(spec * np.conj(spec), s)[:n]
    return res / np.arange(d.shape[0], d.shape[0] - n, -1)


def _kde_lag_term_host(d, w, k, kernel_std):
    """Host twin of ops.stats.kde_lag_correlation."""
    diff = d[:-k] - d[k:]
    return float(np.sum(np.exp(-(diff**2) / (4.0 * kernel_std**2)) * w[:-k] * w[k:]))


def _kde_lag_term_2d_host(d1, d2, w, k, kernel_inv):
    """Host twin of ops.stats.kde_lag_correlation_2d."""
    e1 = d1[:-k] - d1[k:]
    e2 = d2[:-k] - d2[k:]
    m = kernel_inv[0, 0] * e1**2 + 2 * kernel_inv[0, 1] * e1 * e2 + kernel_inv[1, 1] * e2**2
    return float(np.sum(np.exp(-m / 4.0) * w[:-k] * w[k:]))

_int_types = (int, np.integer)

ParamConfidenceData = namedtuple("ParamConfidenceData", ("paramVec", "norm", "indexes", "cumsum"))


class WeightedSampleError(Exception):
    """Error in a WeightedSamples operation."""


class ParamError(WeightedSampleError):
    """A bad parameter was requested."""


class ParSamples:
    """Attribute-bundle container for named parameter sample vectors."""


def print_load_line(message):
    if print_load_details:
        print(message)


def last_modified(files):
    """Latest modification time among the files that exist."""
    return max(os.path.getmtime(fname) for fname in files if os.path.exists(fname))


def slice_or_none(x, start=None, end=None):
    # Tolerate integer-valued float row counts (the reference crashes on
    # x[0.0:] for in-memory multi-chain loads; we coerce instead).
    if isinstance(start, float) and start == int(start):
        start = int(start)
    if isinstance(end, float) and end == int(end):
        end = int(end)
    return x[start:end] if hasattr(x, "__getitem__") else None


def chainFiles(root, chain_indices=None, ext=".txt", separator="_", first_chain=0, last_chain=-1, chain_exclude=None):
    """List chain sample files for a root name, applying index filters.

    Matches the reference's name conventions (``chains.py:77-108``):
    ``root.txt``, ``root_1.txt`` / ``root.1.txt``, or all ``N.txt`` files in
    a directory when root ends with a path separator.
    """
    folder = os.path.dirname(root) or "."
    if root.endswith((os.sep, "/")):
        pattern = re.compile("(?P<num>[0-9]+)?" + re.escape(ext))
    else:
        base = os.path.basename(root)
        pattern = re.compile(re.escape(base) + "(" + re.escape(separator) + "(?P<num>[0-9]+))?" + re.escape(ext))
    files = []
    for fname in sorted(os.listdir(folder)):
        match = pattern.fullmatch(fname)
        if not match:
            continue
        index = int(match.group("num") or 0)
        if (
            (chain_indices is None or index in chain_indices)
            and (chain_exclude is None or index not in chain_exclude)
            and index >= first_chain
            and (last_chain < 0 or index <= last_chain)
        ):
            files.append(os.path.join(folder, fname))
    return files


def hasChainFiles(file_root, ext=".txt"):
    return any(chainFiles(file_root, ext=ext, separator=sep, last_chain=1) for sep in ["_", "."])


def findChainFileRoot(chain_dir, root, search_subdirectories=True):
    """Find a chain root under a directory tree; returns full path root or None."""
    root = root.replace("/", os.sep).replace("\\", os.sep)
    file_root = os.path.join(chain_dir, root)
    if hasChainFiles(file_root):
        return file_root
    if search_subdirectories:
        for base, dirs, _files in os.walk(chain_dir):
            for subdir in dirs:
                candidate = os.path.join(base, subdir, root)
                if hasChainFiles(candidate):
                    return candidate
    return None


def loadNumpyTxt(fname, skiprows=None):
    """Load a numpy array from a whitespace-separated text file.

    Uses the native multi-threaded parser (getdist_tpu._native) when
    available, falling back to np.loadtxt (reference ``chains.py:115``)."""
    try:
        from getdist_tpu import _native

        data = _native.load_chain_text(fname, skiprows or 0)
        if data is not None:
            return np.atleast_2d(data)
    except Exception:
        pass
    try:
        return np.atleast_2d(np.loadtxt(fname, skiprows=skiprows or 0))
    except ValueError:
        print("Error reading %s" % fname)
        raise


def covToCorr(cov, copy=True):
    """Covariance matrix -> correlation matrix (zero-variance rows kept)."""
    if copy:
        cov = np.array(cov)
    for i, di in enumerate(np.sqrt(cov.diagonal())):
        if di:
            cov[i, :] /= di
            cov[:, i] /= di
    return cov


def getSignalToNoise(C, noise=None, R=None, eigs_only=False):
    """Signal-to-noise eigen-analysis: eigenvalues (and rotation) of
    R C R^T with R the inverse Cholesky root of the noise matrix."""
    if R is None:
        if noise is None:
            raise WeightedSampleError("Must give noise or rotation R")
        R = np.linalg.inv(np.linalg.cholesky(noise))
    M = R @ C @ R.T
    if eigs_only:
        return np.linalg.eigvalsh(M)
    w, U = np.linalg.eigh(M)
    return w, U.T @ R


# ---------------------------------------------------------------------------


class WeightedSamples:
    """A set of weighted parameter samples.

    :ivar weights: (N,) weights per sample
    :ivar loglikes: (N,) -log(posterior) per sample, or None
    :ivar samples: (N, n) parameter values
    :ivar n: number of parameters
    :ivar numrows: number of samples
    """

    def __init__(
        self,
        filename=None,
        ignore_rows=0,
        samples=None,
        weights=None,
        loglikes=None,
        name_tag=None,
        label=None,
        files_are_chains=True,
        min_weight_ratio=1e-30,
    ):
        """
        :param filename: plain text chain file to load
        :param ignore_rows: int >= 1 rows, or float < 1 fraction, to skip as burn-in
        :param samples: (N, n) array (or list of vectors) of parameter values
        :param weights: (N,) weights (default all 1)
        :param loglikes: (N,) -log(posterior)
        :param name_tag: name for this sample set
        :param label: latex label
        :param files_are_chains: False if the file has no weight/loglike columns
        :param min_weight_ratio: drop samples below this ratio of the max weight
        """
        self.precision = "%.8e"
        self.min_weight_ratio = min_weight_ratio
        self._device_cache = None
        if filename:
            cols = loadNumpyTxt(filename, skiprows=ignore_rows)
            if not len(cols):
                raise WeightedSampleError("Empty chain: %s" % filename)
            self.setColData(cols, are_chains=files_are_chains)
            self.name_tag = name_tag or os.path.basename(filename)
        else:
            self.setSamples(
                slice_or_none(samples, ignore_rows),
                slice_or_none(weights, ignore_rows),
                slice_or_none(loglikes, ignore_rows),
            )
            self.name_tag = name_tag
            if samples is not None and int(ignore_rows):
                print_load_line("Removed %s lines as burn in" % ignore_rows)
        self.label = label
        self.needs_update = True

    # -- setup ---------------------------------------------------------------
    def setColData(self, coldata, are_chains=True):
        """Set samples from a file-loaded array; first two columns are
        weight and -log(like) unless are_chains=False."""
        if are_chains:
            self.setSamples(coldata[:, 2:], coldata[:, 0], coldata[:, 1])
        else:
            self.setSamples(coldata)

    def setSamples(self, samples, weights=None, loglikes=None, min_weight_ratio=None):
        """Set samples/weights/loglikes from arrays; applies the min-weight
        filter unless min_weight_ratio is negative."""
        self.weights = None if weights is None else np.ascontiguousarray(weights, dtype=np.float64)
        self.loglikes = None if loglikes is None else np.ascontiguousarray(loglikes, dtype=np.float64)
        self.samples = samples
        if samples is not None:
            if isinstance(samples, (list, tuple)):
                samples = np.column_stack(samples)
            samples = np.asarray(samples, dtype=np.float64)
            if samples.ndim == 1:
                samples = samples[:, None]
            self.samples = np.ascontiguousarray(samples)
            self.n = self.samples.shape[1]
            self.numrows = self.samples.shape[0]
            if min_weight_ratio is None:
                min_weight_ratio = self.min_weight_ratio
            if min_weight_ratio is not None and min_weight_ratio >= 0:
                self.setMinWeightRatio(min_weight_ratio)
        self._weightsChanged()

    def changeSamples(self, samples):
        """Replace samples keeping weights and loglikes."""
        self.setSamples(samples, self.weights, self.loglikes)

    def _weightsChanged(self):
        if self.weights is not None:
            self.norm = np.sum(self.weights)
        elif self.samples is not None:
            self.weights = np.ones(self.numrows)
            self.norm = np.float64(self.numrows)
        self.means = None
        self.mean_loglike = None
        self.diffs = None
        self.fullcov = None
        self.correlationMatrix = None
        self.vars = None
        self.sddev = None
        self.needs_update = True
        self._device_cache = None

    # -- device bridge ---------------------------------------------------------
    @staticmethod
    def _device_stats_ok():
        """Whether device statistics keep reference (f64) accuracy: true on
        accelerators (f32 is the intended fast mode there) and on CPU when
        x64 is enabled; on f32-only CPU configs we fall back to numpy so
        results never silently degrade below the reference."""
        import jax

        return jax.config.jax_enable_x64 or jax.default_backend() != "cpu"

    def _dev(self):
        """Device-resident (samples, weights, loglikes) arrays, cached until
        the host copies mutate. This is the host->HBM boundary."""
        if self._device_cache is None:
            self._device_cache = (
                jnp.asarray(self.samples),
                jnp.asarray(self.weights),
                None if self.loglikes is None else jnp.asarray(self.loglikes),
            )
        return self._device_cache

    # -- naming ----------------------------------------------------------------
    def getName(self):
        """The name tag of these samples."""
        return self.name_tag

    def getLabel(self):
        """The latex label for the samples."""
        return self.label or escapeLatex(self.getName())

    # -- parameter access --------------------------------------------------------
    def _makeParamvec(self, par):
        if isinstance(par, _int_types):
            if 0 <= par < self.n:
                return self.samples[:, par]
            if par == -1:
                if self.loglikes is None:
                    raise WeightedSampleError("Samples do not have logLikes (par=-1)")
                return self.loglikes
            if par == -2:
                return self.weights
            raise WeightedSampleError("Parameter %i does not exist" % par)
        return par

    def __getitem__(self, item):
        return self._makeParamvec(item)

    # -- moments -------------------------------------------------------------
    def setMeans(self):
        """Compute and cache weighted means (device matvec)."""
        if not self._device_stats_ok():
            self.means = self.weights.dot(self.samples) / self.norm
            self.mean_loglike = (
                float(self.weights.dot(self.loglikes) / self.norm) if self.loglikes is not None else None
            )
            return self.means
        dev_samples, dev_weights, dev_loglikes = self._dev()
        self.means = np.array(_stats.weighted_mean(dev_samples, dev_weights))
        if self.loglikes is not None:
            self.mean_loglike = float(np.asarray(_stats.weighted_mean(dev_loglikes, dev_weights)))
        else:
            self.mean_loglike = None
        return self.means

    def getMeans(self, pars=None):
        """Weighted parameter means (cached)."""
        if self.means is None:
            self.setMeans()
        if pars is None:
            return self.means
        return np.array([self.means[i] for i in pars])

    def getVars(self):
        """Weighted parameter variances (cached; also sets sddev)."""
        if self.means is None:
            self.setMeans()
        if not self._device_stats_ok():
            diffs = self.samples - self.means
            self.vars = self.weights.dot(diffs * diffs) / self.norm
        else:
            dev_samples, dev_weights, _ = self._dev()
            self.vars = np.array(_stats.weighted_var(dev_samples, dev_weights, jnp.asarray(self.means)))
        self.sddev = np.sqrt(self.vars)
        return self.vars

    def setDiffs(self):
        """Cache the array of parameter differences from the means."""
        self.diffs = self.mean_diffs()
        return self.diffs

    def weighted_sum(self, paramVec, where=None):
        """sum_i w_i p_i (optionally over a sample filter)."""
        paramVec = self._makeParamvec(paramVec)
        if where is None:
            return self.weights.dot(paramVec)
        return np.dot(paramVec[where], self.weights[where])

    def get_norm(self, where=None):
        """Sum of sample weights."""
        if where is None:
            if self.norm is None:
                self.norm = np.sum(self.weights)
            return self.norm
        return np.sum(self.weights[where])

    def mean(self, paramVec, where=None):
        """Weighted mean of a parameter vector (or list of them)."""
        if isinstance(paramVec, (list, tuple)):
            return np.array([self.weighted_sum(p, where) for p in paramVec]) / self.get_norm(where)
        return self.weighted_sum(paramVec, where) / self.get_norm(where)

    def mean_diff(self, paramVec, where=None):
        """p - mean(p) for one parameter vector."""
        if isinstance(paramVec, _int_types) and paramVec >= 0 and where is None:
            if self.diffs is not None:
                return self.diffs[paramVec]
            return self.samples[:, paramVec] - self.getMeans()[paramVec]
        paramVec = self._makeParamvec(paramVec)
        if where is None:
            return paramVec - self.mean(paramVec)
        return paramVec[where] - self.mean(paramVec, where)

    def mean_diffs(self, pars=None, where=None) -> Sequence:
        """List of p_i - mean(p_i) arrays."""
        if pars is None:
            pars = self.n
        if isinstance(pars, _int_types) and pars >= 0 and where is None:
            means = self.getMeans()
            return [self.samples[:, i] - means[i] for i in range(pars)]
        if isinstance(pars, _int_types) and pars >= 0:
            return [self.mean_diff(i, where) for i in range(pars)]
        return [self.mean_diff(i, where) for i in pars]

    def var(self, paramVec, where=None):
        """Weighted variance of a parameter vector (or list of them)."""
        if isinstance(paramVec, (list, tuple)):
            return np.array([self.var(p) for p in paramVec])
        if where is not None:
            return np.dot(self.mean_diff(paramVec, where) ** 2, self.weights[where]) / self.get_norm(where)
        return np.dot(self.mean_diff(paramVec) ** 2, self.weights) / self.get_norm()

    def std(self, paramVec, where=None):
        """Weighted standard deviation."""
        return np.sqrt(self.var(paramVec, where))

    def cov(self, pars=None, where=None):
        """Weighted covariance for the given parameter vectors/indices
        (all parameters by default). All-parameter case runs as a single
        device matmul."""
        if pars is None and where is None:
            if not self._device_stats_ok():
                diffs = self.samples - self.getMeans()
                return (diffs * self.weights[:, None]).T @ diffs / self.norm
            dev_samples, dev_weights, _ = self._dev()
            # writable: callers legitimately mutate covariances (covToCorr copy=False)
            return np.array(_stats.weighted_cov(dev_samples, dev_weights))
        diffs = self.mean_diffs(pars, where)
        weights = self.weights if where is None else self.weights[where]
        stacked = np.column_stack(diffs)
        cov = (stacked * weights[:, None]).T @ stacked
        return cov / self.get_norm(where)

    def corr(self, pars=None):
        """Weighted correlation matrix."""
        return covToCorr(self.cov(pars))

    def getCov(self, nparam=None, pars=None):
        """Covariance matrix (cached full version), optionally a submatrix."""
        if self.fullcov is None:
            self._setCov()
        if pars is not None:
            return self.fullcov[np.ix_(pars, pars)]
        return self.fullcov[:nparam, :nparam]

    def _setCov(self):
        self.fullcov = self.cov()
        return self.fullcov

    def getCorrelationMatrix(self):
        """Correlation matrix of all parameters (cached)."""
        if self.correlationMatrix is None:
            self.correlationMatrix = covToCorr(self.getCov())
        return self.correlationMatrix

    def getSignalToNoise(self, params, noise=None, R=None, eigs_only=False):
        """Signal-to-noise eigenvalues for the given parameters."""
        return getSignalToNoise(self.cov(params), noise, R, eigs_only)

    # -- correlation structure --------------------------------------------------
    def getAutocorrelation(self, paramVec, maxOff=None, weight_units=True, normalized=True):
        """Weighted autocorrelation of a parameter (device FFT), in weight
        units by default (reference ``chains.py:423-447``)."""
        if maxOff is None:
            maxOff = self.n - 1
        d = self.mean_diff(paramVec) * self.weights
        if _use_device_ops:
            corr = np.array(autoConvolve(jnp.asarray(d), n=maxOff + 1, normalize=True))
        else:
            corr = _autoconvolve_host(np.asarray(d), maxOff + 1)
        if normalized:
            corr /= self.var(paramVec)
        if weight_units:
            return corr * d.size / self.get_norm()
        return corr

    def getCorrelationLength(self, j, weight_units=True, min_corr=0.05, corr=None):
        """Autocorrelation length: corr[0] + 2 sum of positive tail above
        min_corr (reference ``chains.py:449-466``)."""
        if corr is None:
            corr = self.getAutocorrelation(j, self.numrows // 10, weight_units=weight_units)
        ix = np.argmin(corr > min_corr * corr[0])
        return corr[0] + 2 * np.sum(corr[1:ix])

    def getEffectiveSamples(self, j=0, min_corr=0.05):
        """N_eff = sum(w) / correlation length for parameter j."""
        return self.get_norm() / self.getCorrelationLength(j, min_corr=min_corr)

    def _kde_uncorr_term(self, corr_fn, base_lag):
        # Expected pair term for uncorrelated samples, averaged over 5 lags
        # near numrows//2 (reference chains.py:510-518, 613-622).
        uncorr_term = 0.0
        nav = 0
        for k in range(base_lag, base_lag + 5):
            nav += self.numrows - k
            uncorr_term += corr_fn(k)
        return uncorr_term / nav

    def getEffectiveSamplesGaussianKDE(self, paramVec, h=0.2, scale=None, maxoff=None, min_corr=0.05):
        """Effective sample number for the leading MISE term of a Gaussian
        KDE, accounting for sample correlation with adaptive lag sampling.

        Semantics match the reference (``chains.py:477-574``): a fiducial
        kernel of width h*sigma, pair sums over lags with a subtracted
        uncorrelated baseline, early exit below min_corr, and step-sampled
        lags for long correlation lengths. Each lag term is one device
        kernel launch (``ops.stats.kde_lag_correlation``).
        """
        if getattr(self, "sampler", "") in ("nested", "uncorrelated"):
            return self.get_norm() ** 2 / np.dot(self.weights, self.weights)
        d = self._makeParamvec(paramVec)
        kernel_std = (scale or self.std(d)) * h
        if maxoff is None:
            maxoff = int(self.getCorrelationLength(d, weight_units=False) * 1.5) + 4
        maxoff = min(maxoff, self.numrows // 10)

        n = float(self.numrows)
        uncorr_len = self.numrows // 2

        if _use_device_ops:
            dev_d = jnp.asarray(d)
            dev_w = jnp.asarray(self.weights)

            def raw_term(k):
                return float(_stats.kde_lag_correlation(dev_d, dev_w, k, kernel_std))

        else:
            host_d = np.asarray(d, float)
            host_w = np.asarray(self.weights, float)

            def raw_term(k):
                return _kde_lag_term_host(host_d, host_w, k, kernel_std)

        uncorr_term = self._kde_uncorr_term(raw_term, uncorr_len)

        def corr_k(k):
            return raw_term(k) - (n - k) * uncorr_term

        corr0 = float(np.dot(self.weights, self.weights))
        threshold = min_corr * corr0
        corr1 = corr_k(1)
        if corr1 < threshold:
            N = corr0
        else:
            corr2 = corr_k(2)
            if corr2 > threshold:
                max_k = maxoff
                # find the largest lag scale still above threshold, by thirds
                while max_k > 10:
                    if corr_k(max_k // 3) >= threshold:
                        break
                    max_k //= 3
                step_size = 1 if max_k < 20 else max_k // 10
                cum_sum = corr1 + corr2
                for k in range(3, maxoff + 1, step_size):
                    test_val = corr_k(k)
                    if test_val < threshold:
                        break
                    if k > 3:
                        cum_sum += test_val * step_size
                    else:
                        cum_sum += (test_val * step_size) / 2
                N = corr0 + 2 * cum_sum
            else:
                N = corr0 + 2 * corr1
        return self.get_norm() ** 2 / N

    def getEffectiveSamplesGaussianKDE_2d(self, i, j, h=0.3, maxoff=None, min_corr=0.05):
        """2D variant of the KDE effective-sample estimate (reference
        ``chains.py:576-635``)."""
        if getattr(self, "sampler", "") in ("nested", "uncorrelated"):
            return self.get_norm() ** 2 / np.dot(self.weights, self.weights)
        d1 = self._makeParamvec(i)
        d2 = self._makeParamvec(j)
        cov = self.cov([d1, d2])
        if abs(cov[0, 1]) > np.sqrt(cov[0, 0] * cov[1, 1]) * 0.999:
            return self.getEffectiveSamplesGaussianKDE(i, h=h, min_corr=min_corr)
        kernel_inv = np.linalg.inv(cov) / h**2
        if maxoff is None:
            maxoff = (
                int(
                    max(
                        self.getCorrelationLength(d1, weight_units=False),
                        self.getCorrelationLength(d2, weight_units=False),
                    )
                    * 1.5
                )
                + 4
            )
        maxoff = min(maxoff, self.numrows // 10)

        n = float(self.numrows)
        uncorr_len = self.numrows // 2

        if _use_device_ops:
            dev_d1 = jnp.asarray(d1)
            dev_d2 = jnp.asarray(d2)
            dev_w = jnp.asarray(self.weights)

            dev_kinv = jnp.asarray(kernel_inv)

            def raw_term(k):
                return float(_stats.kde_lag_correlation_2d(dev_d1, dev_d2, dev_w, k, dev_kinv))

        else:
            h_d1 = np.asarray(d1, float)
            h_d2 = np.asarray(d2, float)
            h_w = np.asarray(self.weights, float)
            h_kinv = np.asarray(kernel_inv, float)

            def raw_term(k):
                return _kde_lag_term_2d_host(h_d1, h_d2, h_w, k, h_kinv)

        uncorr_term = self._kde_uncorr_term(raw_term, uncorr_len)
        corr0 = float(np.dot(self.weights, self.weights))
        total = corr0
        for k in range(1, maxoff + 1):
            term = raw_term(k) - (n - k) * uncorr_term
            if term < min_corr * corr0:
                break
            total += 2 * term
        return self.get_norm() ** 2 / total

    # -- confidence limits ------------------------------------------------------
    def twoTailLimits(self, paramVec, confidence):
        """Two-tail equal-area confidence limits by sample counting."""
        limits = np.array([(1 - confidence) / 2, 1 - (1 - confidence) / 2])
        return self.confidence(paramVec, limits)

    def initParamConfidenceData(self, paramVec, start=0, end=None, weights=None):
        """Cache sorted values/cumulative weights for repeated confidence
        queries on one parameter."""
        if weights is None:
            weights = self.weights
        paramVec = self._makeParamvec(paramVec)[start:end]
        if _use_device_ops:
            indices = np.asarray(jnp.argsort(jnp.asarray(paramVec)))
        else:
            indices = np.argsort(paramVec)
        return ParamConfidenceData(
            paramVec=paramVec,
            norm=np.sum(weights[start:end]),
            indexes=indices,
            cumsum=np.cumsum(weights[start + indices]),
        )

    def confidence(self, paramVec, limfrac, upper=False, start=0, end=None, weights=None):
        """Tail-count confidence limit(s): the parameter value where limfrac
        of the total weight is further in the tail."""
        if isinstance(paramVec, ParamConfidenceData):
            d = paramVec
        else:
            d = self.initParamConfidenceData(paramVec, start, end, weights)
        target = d.norm * (1 - limfrac) if upper else d.norm * limfrac
        ix = np.searchsorted(d.cumsum, target)
        return d.paramVec[d.indexes[np.minimum(ix, d.indexes.shape[0] - 1)]]

    # -- thinning / reweighting ---------------------------------------------------
    def thin_indices(self, factor, weights=None):
        """Indices making unit-weight samples, assuming integer weights."""
        if weights is None:
            weights = self.weights
        return WeightedSamples.thin_indices_single_samples(factor, weights)

    @staticmethod
    def thin_indices_and_weights(factor, weights):
        """(unique indices, new counts) for weight-preserving thinning."""
        thin_ix = WeightedSamples.thin_indices_single_samples(factor, weights)
        return np.unique(thin_ix, return_counts=True)

    @staticmethod
    def thin_indices_single_samples(factor, weights):
        """Exact integer-weight partition thinning (reference
        ``chains.py:878-916``): walk the weight multiplicities emitting one
        index per `factor` accumulated weight."""
        numrows = len(weights)
        norm1 = np.sum(weights)
        weights = weights.astype(int)
        norm = np.sum(weights)
        if abs(norm - norm1) > 1e-4:
            raise WeightedSampleError("Can only thin with integer weights")
        if factor != int(factor):
            raise WeightedSampleError("Thin factor must be integer")
        factor = int(factor)
        if factor >= np.max(weights):
            cumsum = np.cumsum(weights) // factor
            _, thin_ix = np.unique(cumsum, return_index=True)
            return thin_ix
        thin_ix = np.empty(norm // factor, dtype=int)
        tot = 0
        ix = 0
        i = 0
        mult = weights[0]
        while i < numrows:
            if mult + tot < factor:
                tot += mult
                i += 1
                if i < numrows:
                    mult = weights[i]
            else:
                thin_ix[ix] = i
                ix += 1
                if mult == factor - tot:
                    i += 1
                    if i < numrows:
                        mult = weights[i]
                else:
                    mult -= factor - tot
                tot = 0
        return thin_ix

    def random_single_samples_indices(self, random_state=None, thin=None, max_samples=None):
        """Random unit-weight sample indices drawn proportionally to weight."""
        if max_samples is None:
            thin = thin or 1
        else:
            if thin is not None:
                raise WeightedSampleError("Cannot set thin and max_samples")
            thin = max(1, self.norm / np.max(self.weights) / max_samples)
        random_state = np.random.default_rng(random_state)
        rand = random_state.random(self.numrows)
        return np.nonzero(rand <= self.weights / (np.max(self.weights) * thin))[0]

    def thin(self, factor):
        """Thin to unit-weight samples by the given integer factor."""
        thin_ix = self.thin_indices(factor)
        self.setSamples(
            self.samples[thin_ix, :],
            loglikes=None if self.loglikes is None else self.loglikes[thin_ix],
            min_weight_ratio=-1,
        )

    def weighted_thin(self, factor):
        """Thin preserving (integer) weights."""
        unique, counts = self.thin_indices_and_weights(factor, self.weights)
        self.setSamples(
            self.samples[unique, :],
            loglikes=None if self.loglikes is None else self.loglikes[unique],
            weights=counts,
            min_weight_ratio=-1,
        )

    def filter(self, where):
        """Keep only samples matching the index list / boolean filter."""
        self.setSamples(
            self.samples[where, :],
            self.weights[where],
            None if self.loglikes is None else self.loglikes[where],
            min_weight_ratio=-1,
        )

    def reweightAddingLogLikes(self, logLikes):
        """Importance-reweight by adding -log(likelihood) values."""
        scale = np.min(logLikes)
        if self.loglikes is not None:
            self.loglikes = self.loglikes + logLikes
        self.weights = np.asarray(self.weights, dtype=np.float64) * np.exp(-(logLikes - scale))
        self._weightsChanged()

    def cool(self, cool):
        """Multiply -log(likes) by ``cool`` and reweight accordingly."""
        if self.loglikes is None:
            raise WeightedSampleError("Samples have no likelihood values, required to cool")
        MaxL = np.min(self.loglikes)
        newL = self.loglikes * cool
        self.weights = np.asarray(self.weights, dtype=np.float64) * np.exp(
            -(newL - self.loglikes) - MaxL * (1 - cool)
        )
        self.loglikes = newL
        self._weightsChanged()

    def deleteZeros(self):
        """Remove zero-weight samples."""
        self.filter(self.weights > 0)

    def setMinWeightRatio(self, min_weight_ratio=1e-30):
        """Remove samples below min_weight_ratio of the maximum weight."""
        if self.weights is not None and min_weight_ratio >= 0:
            max_weight = np.max(self.weights)
            if np.min(self.weights) < max_weight * min_weight_ratio:
                self.filter(self.weights > max_weight * min_weight_ratio)

    def deleteFixedParams(self):
        """Remove parameters that never vary; returns (indices, values)."""
        fixed = []
        values = []
        for i in range(self.samples.shape[1]):
            if np.isclose(self.samples[0, i], self.samples[-1, i], equal_nan=True):
                mean = np.average(self.samples[:, i])
                if np.allclose(self.samples[:, i], mean, rtol=1e-12, atol=0, equal_nan=True):
                    fixed.append(i)
                    values.append(mean)
        self.changeSamples(np.delete(self.samples, fixed, 1))
        return fixed, values

    def removeBurn(self, remove=0.3):
        """Remove burn-in: a fraction (< 1) or number (>= 1) of initial rows."""
        ix = int(remove) if remove >= 1 else int(round(self.numrows * remove))
        if self.weights is not None:
            self.weights = self.weights[ix:]
        if self.loglikes is not None:
            self.loglikes = self.loglikes[ix:]
        self.changeSamples(self.samples[ix:, :])

    # -- output -------------------------------------------------------------
    def saveAsText(self, root, chain_index=None, make_dirs=False):
        """Save as a getdist-format text chain file."""
        loglikes = self.loglikes if self.loglikes is not None else np.zeros(self.numrows)
        if make_dirs and not os.path.exists(os.path.dirname(root)):
            os.makedirs(os.path.dirname(root))
        if root.endswith(".txt"):
            root = root[:-4]
        np.savetxt(
            root + ("" if chain_index is None else "_" + str(chain_index + 1)) + ".txt",
            np.hstack((self.weights.reshape(-1, 1), loglikes.reshape(-1, 1), self.samples)),
            fmt=self.precision,
        )


# ---------------------------------------------------------------------------


class Chains(WeightedSamples):
    """One or more chains of weighted samples with named parameters.

    Adds a name->index map, getParams() attribute bundles, per-chain views
    via chain_offsets (no copying), and Gelman-Rubin diagnostics.
    """

    def __init__(
        self,
        root=None,
        jobItem=None,
        paramNamesFile=None,
        names=None,
        labels=None,
        renames=None,
        sampler=None,
        **kwargs,
    ):
        """
        :param root: optional file root
        :param jobItem: optional grid jobItem with chainRoot/batchPath
        :param paramNamesFile: .paramnames file for names
        :param names: list of name strings
        :param labels: list of latex labels
        :param renames: dict of parameter aliases
        :param sampler: 'mcmc' (default), 'nested' or 'uncorrelated'
        :param kwargs: passed to :class:`WeightedSamples`
        """
        self.chains = None
        self.chain_offsets = None
        super().__init__(**kwargs)
        self.jobItem = jobItem
        self.ignore_lines = float(kwargs.get("ignore_rows", 0))
        self.root = root
        if not paramNamesFile and root:
            if os.path.exists(root + ".paramnames"):
                paramNamesFile = root + ".paramnames"
            else:
                from getdist_tpu import cobaya_interface

                paramNamesFile = cobaya_interface.cobaya_params_file(root)
        self.setParamNames(paramNamesFile or names)
        if labels is not None:
            self.paramNames.setLabels(labels)
        if renames is not None:
            self.updateRenames(renames)
        if isinstance(sampler, str):
            self.setSampler(sampler)
        else:
            self.sampler = "mcmc"

    def setSampler(self, sampler):
        """Set the sampler type ('mcmc', 'nested' or 'uncorrelated')."""
        sampler = sampler.lower()
        if sampler not in ("mcmc", "nested", "uncorrelated"):
            warn(f"Unknown sampler type {sampler}. Assuming MCMC.")
            sampler = "mcmc"
        self.sampler = sampler

    def setParamNames(self, names=None):
        """Set parameter names from a ParamNames, filename, or name list."""
        self.paramNames = None
        if isinstance(names, ParamNames):
            self.paramNames = deepcopy(names)
        elif isinstance(names, str):
            self.paramNames = ParamNames(names)
        elif names is not None:
            self.paramNames = ParamNames(names=names)
        elif self.samples is not None:
            self.paramNames = ParamNames(default=self.n)
        if self.paramNames:
            self._getParamIndices()
        self.needs_update = True

    def getParamNames(self):
        """The :class:`~.paramnames.ParamNames` for these samples."""
        return self.paramNames

    def _getParamIndices(self):
        if self.samples is not None and len(self.paramNames.names) != self.n:
            raise WeightedSampleError(
                "paramNames size (%s) does not match number of parameters in samples (%s)"
                % (len(self.paramNames.names), self.n)
            )
        self.index = {info.name: i for i, info in enumerate(self.paramNames.names)}
        return self.index

    def _parAndNumber(self, name):
        """(index, ParamInfo) for a name, index, or ParamInfo."""
        if isinstance(name, ParamInfo):
            name = name.name
        if isinstance(name, str):
            name = self.index.get(name)
            if name is None:
                return None, None
        if isinstance(name, _int_types):
            return name, self.paramNames.names[name]
        raise ParamError("Unknown parameter type %s" % name)

    def getRenames(self):
        """Dict of renames known to each parameter."""
        return self.paramNames.getRenames()

    def updateRenames(self, renames):
        """Merge a rename dict into the parameter aliases."""
        self.paramNames.updateRenames(renames)

    # -- named vectors --------------------------------------------------------
    def setParams(self, obj):
        """Attach obj.<name> sample vectors for every parameter; dotted
        names create sub-objects (obj.aa.bb.cc)."""
        for second in (False, True):
            for i, info in enumerate(self.paramNames.names):
                path = info.name.split(".")
                node = obj
                for part in path[:-1]:
                    if not hasattr(node, part):
                        setattr(node, part, ParSamples())
                    node = getattr(node, part)
                if second:
                    if isinstance(getattr(node, path[-1], None), ParSamples):
                        getattr(node, path[-1]).value = self.samples[:, i]
                    else:
                        setattr(node, path[-1], self.samples[:, i])
        return obj

    def getParams(self):
        """A ParSamples bundle with a vector attribute per parameter."""
        pars = ParSamples()
        self.setParams(pars)
        return pars

    def getParamSampleDict(self, ix, want_derived=True):
        """Dict of parameter values for one sample row."""
        res = {
            "weight": self.weights[ix],
            "loglike": None if self.loglikes is None else self.loglikes[ix],
        }
        for i, info in enumerate(self.paramNames.names):
            if want_derived or not info.isDerived:
                res[info.name] = self.samples[ix, i]
        return res

    def _makeParamvec(self, par):
        if self.needs_update:
            self.updateBaseStatistics()
        if isinstance(par, ParamInfo):
            par = par.name
        if isinstance(par, str):
            index = self.index.get(par)
            if index is not None:
                return self.samples[:, index]
            if par == "weight":
                return self.weights
            if par == "loglike":
                return self.loglikes
            raise ParamError("Unknown parameter %s" % par)
        return super()._makeParamvec(par)

    def updateBaseStatistics(self):
        """Recompute means/vars and multiplicity stats after changes."""
        self.setMeans()
        self.getVars()
        self.mean_mult = self.norm / self.numrows
        self.max_mult = np.max(self.weights)
        self._getParamIndices()
        self.needs_update = False
        return self

    def updateChainBaseStatistics(self):
        # legacy name
        return self.updateBaseStatistics()

    def addDerived(self, paramVec, name, **kwargs):
        """Append a derived parameter vector with the given name."""
        if self.paramNames.parWithName(name):
            raise ValueError("Parameter with name %s already exists" % name)
        self.changeSamples(np.c_[self.samples, paramVec])
        return self.paramNames.addDerived(name, **kwargs)

    # -- multi-chain management ----------------------------------------------
    def loadChains(self, root, files_or_samples, weights=None, loglikes=None, ignore_lines=None):
        """Load chains from a list of files, a single array, or a list of
        arrays; returns True if anything was loaded."""
        self.chains = []
        self.samples = None
        self.weights = None
        self.loglikes = None
        if ignore_lines is None:
            ignore_lines = self.ignore_lines
        ws_args = {"ignore_rows": ignore_lines, "min_weight_ratio": self.min_weight_ratio}
        if files_or_samples is None or (hasattr(files_or_samples, "__len__") and not len(files_or_samples)):
            raise ValueError("files_or_samples empty in loadChains")
        if isinstance(files_or_samples, str) or isinstance(files_or_samples[0], str):
            if weights is not None or loglikes is not None:
                raise ValueError("weights and loglikes not needed reading from file")
            if isinstance(files_or_samples, str):
                files_or_samples = [files_or_samples]
            self.name_tag = self.name_tag or os.path.basename(root)
            for fname in files_or_samples:
                print_load_line(fname)
                try:
                    self.chains.append(WeightedSamples(fname, **ws_args))
                except WeightedSampleError:
                    print_load_line("Ignored file %s (likely empty)" % fname)
            nchains = len(self.chains)
            if not nchains:
                raise WeightedSampleError("loadChains - no chains found for " + root)
        else:

            def array_dimension(a):
                d = 0
                while True:
                    try:
                        a = a[0]
                        d += 1
                    except (TypeError, IndexError):
                        return d

            dim = array_dimension(files_or_samples)
            if dim in (1, 2):
                self.chains = None
                self.setSamples(
                    slice_or_none(files_or_samples, ignore_lines),
                    slice_or_none(weights, ignore_lines),
                    slice_or_none(loglikes, ignore_lines),
                    self.min_weight_ratio,
                )
                if self.paramNames is None:
                    self.paramNames = ParamNames(default=self.n)
                nchains = 1
            elif dim == 3:
                for i, samples_i in enumerate(files_or_samples):
                    self.chains.append(
                        WeightedSamples(
                            samples=samples_i,
                            loglikes=None if loglikes is None else loglikes[i],
                            weights=None if weights is None else weights[i],
                            **ws_args,
                        )
                    )
                if self.paramNames is None:
                    self.paramNames = ParamNames(default=self.chains[0].n)
                nchains = len(self.chains)
            else:
                raise ValueError("samples or files must be an array of samples, or a list of arrays or files")
        self._weightsChanged()
        return nchains > 0

    def makeSingle(self):
        """Concatenate separate chains into one array, recording offsets."""
        if not self.chains:
            raise ValueError("There are no separated chains for makeSingle()")
        self.chain_offsets = np.cumsum(np.array([0] + [chain.samples.shape[0] for chain in self.chains]))
        weights = None if self.chains[0].weights is None else np.hstack([c.weights for c in self.chains])
        loglikes = None if self.chains[0].loglikes is None else np.hstack([c.loglikes for c in self.chains])
        self.setSamples(np.vstack([c.samples for c in self.chains]), weights, loglikes, min_weight_ratio=-1)
        self.chains = None
        self.needs_update = True
        return self

    def getSeparateChains(self):
        """Per-chain WeightedSamples views (no copies when combined)."""
        if self.chains is not None:
            return self.chains
        if self.chain_offsets is None:
            raise WeightedSampleError("Samples were not combined from separate chains")
        return [
            WeightedSamples(
                samples=self.samples[off1:off2],
                weights=self.weights[off1:off2],
                loglikes=None if self.loglikes is None else self.loglikes[off1:off2],
            )
            for off1, off2 in zip(self.chain_offsets[:-1], self.chain_offsets[1:])
        ]

    def filter(self, where):
        """Filter samples, fixing up chain offsets so chains stay splittable."""
        if self.chains is None:
            if self.chain_offsets is not None:
                lens = [0]
                for off1, off2 in zip(self.chain_offsets[:-1], self.chain_offsets[1:]):
                    lens.append(np.count_nonzero(where[off1:off2]))
                self.chain_offsets = np.cumsum(np.array(lens))
            super().filter(where)
        else:
            raise ValueError("chains are separated, makeSingle first or call filter on individual chains")

    def weighted_thin(self, factor):
        """Weight-preserving thin, applied per chain when chains exist."""
        if not self.chains and self.chain_offsets is None:
            return super().weighted_thin(factor)
        has_chains = self.chains
        chains = self.getSeparateChains()
        for chain in chains:
            chain.weighted_thin(factor)
        self.chains = chains
        if not has_chains:
            self.makeSingle()
        self.needs_update = True

    def removeBurnFraction(self, ignore_frac):
        """Remove burn-in fraction from combined samples or each chain."""
        if self.samples is not None:
            self.removeBurn(ignore_frac)
            self.chains = None
            self.needs_update = True
        else:
            for chain in self.chains:
                chain.removeBurn(ignore_frac)

    def deleteFixedParams(self):
        """Delete non-varying parameters, updating names and any ranges."""
        if self.samples is not None:
            fixed, values = super().deleteFixedParams()
            self.chains = None
        else:
            fixed, values = self.chains[0].deleteFixedParams()
            for chain in self.chains[1:]:
                chain.changeSamples(np.delete(chain.samples, fixed, 1))
        if hasattr(self, "ranges"):
            for ix, value in zip(fixed, values):
                self.ranges.setFixed(self.paramNames.names[ix].name, value)
        self.paramNames.deleteIndices(fixed)
        self._getParamIndices()

    # -- convergence ------------------------------------------------------------
    def getGelmanRubinEigenvalues(self, nparam=None, chainlist=None):
        """var(mean)/mean(var) eigenvalues over orthogonalized parameters
        (Brooks & Gelman); vectorized over chains on device."""
        if chainlist is None:
            chainlist = self.getSeparateChains()
        nparam = nparam or self.paramNames.numNonDerived()
        # Per-chain moments are device reductions; the (p, p) eigen-solve is
        # tiny and runs on host with numpy for bit-stable diagnostics text.
        means = self.getMeans()[:nparam]
        meanscov = np.zeros((nparam, nparam))
        meancov = np.zeros((nparam, nparam))
        for chain in chainlist:
            diff = chain.getMeans()[:nparam] - means
            meanscov += np.outer(diff, diff)
            meancov += chain.getCov(nparam)
        meanscov /= len(chainlist) - 1
        meancov /= len(chainlist)
        w, U = np.linalg.eigh(meancov)
        if np.min(w) > 0:
            U /= np.sqrt(w)
            return np.linalg.eigvalsh(U.T @ meanscov @ U)
        return None

    def getGelmanRubin(self, nparam=None, chainlist=None):
        """Worst-eigenvalue R-1 statistic (should be << 1 when converged)."""
        return np.max(self.getGelmanRubinEigenvalues(nparam, chainlist))

    # -- output -----------------------------------------------------------------
    def saveAsText(self, root, chain_index=None, make_dirs=False):
        """Save samples and .paramnames metadata as text."""
        super().saveAsText(root, chain_index, make_dirs)
        if not chain_index:
            self.saveTextMetadata(root)

    def saveTextMetadata(self, root):
        """Save metadata (.paramnames) alongside chain text files."""
        self.paramNames.saveAsText(root + ".paramnames")

    def savePickle(self, filename):
        """Pickle this object to a file."""
        with open(filename, "wb") as output:
            pickle.dump(self, output, pickle.HIGHEST_PROTOCOL)
