"""Gaussian mixture models: analytic truth distributions and Fisher-style
plotting inputs.

Behavior-compatible with the reference ``getdist/gaussian_mixtures.py``:
mixtures with optional hard limits support pdf evaluation, analytic 1D/2D
density grids, marginalization and conditioning, rejection sampling under
bounds, and minting of :class:`~.mcsamples.MCSamples` objects. Sampling uses
numpy Generators with the same call sequence as the reference so seeded test
fixtures are bit-reproducible (do NOT reorder the RNG calls in
:func:`_rejection_sample` or the Random* constructors).

The numerical cores live in module-level helpers; the classes are thin
state-holders over them.
"""

import copy

import numpy as np

from getdist_tpu.densities import Density1D, Density2D
from getdist_tpu.mcsamples import MCSamples
from getdist_tpu.paramnames import ParamNames

__all__ = [
    "MixtureND",
    "Mixture2D",
    "Mixture1D",
    "Gaussian1D",
    "Gaussian2D",
    "GaussianND",
    "RandomTestMixtureND",
    "randomTestMCSamples",
    "make_2D_Cov",
]


def make_2D_Cov(sigmax, sigmay, corr):
    return np.array([[sigmax**2, sigmax * sigmay * corr], [sigmax * sigmay * corr, sigmay**2]])


# ---------------------------------------------------------------------------
# numerical cores
# ---------------------------------------------------------------------------


def _apply_hard_limits(draws, lims):
    """Drop rows outside the per-parameter (min, max) bounds."""
    for axis, (lower, upper) in enumerate(lims):
        if lower is not None:
            draws = draws[draws[:, axis] >= lower]
        if upper is not None:
            draws = draws[draws[:, axis] <= upper]
    return draws


def _rejection_sample(mixture, size, random_state):
    """Rejection-sample ``size`` points from the (possibly bounded) mixture.

    RNG call order (multinomial per round, then one multivariate_normal per
    non-empty component, final permutation when multiple blocks) must stay
    identical for seed-reproducible fixtures.
    """
    accepted = 0
    chunks = []
    round_size = None
    rng = np.random.default_rng(random_state)
    while True:
        counts = rng.multinomial(round_size or size, mixture.weights)
        for count, mean, cov in zip(counts, mixture.means, mixture.covs):
            if count > 0:
                draws = rng.multivariate_normal(mean, cov, size=count)
                if mixture.lims is not None:
                    draws = _apply_hard_limits(draws, mixture.lims)
                accepted += draws.shape[0]
                chunks.append(draws)
        if accepted >= size:
            break
        if round_size is None:
            round_size = min(max(size, 100000), int(1.1 * (size * (size - accepted))) // max(accepted, 1) + 1)
    samples = np.vstack(chunks)
    if len(chunks) > 1:
        samples = rng.permutation(samples)
    if accepted != size:
        samples = samples[: -(accepted - size), :]
    return samples


def _mixture_pdf(means, invcovs, weights, norms, x):
    """Weighted sum of Gaussian component densities at x (vector or batch).
    Components accumulate in order (bit-reproducible fixture loglikes)."""
    total = None
    x = np.asarray(x)
    for i, (mean, icov, weight, norm) in enumerate(zip(means, invcovs, weights, norms)):
        offset = x - mean
        if len(x.shape) == 1:
            component = np.exp(-icov.dot(offset).dot(offset) / 2) / norm
        else:
            component = np.exp(-np.einsum("ik,km,im->i", offset, icov, offset) / 2) / norm
        total = component * weight if not i else total + component * weight
    return total


def _marginal_pdf(means, covs, weights, index, x):
    """Analytic 1D marginal: weighted sum of the per-component normals."""
    total = None
    for i, (mean, cov, weight) in enumerate(zip(means, covs, weights)):
        offset = x - mean[index]
        var = cov[index, index]
        component = np.exp(-(offset**2) / var / 2) / np.sqrt(2 * np.pi * var)
        total = component * weight if not i else total + component * weight
    return total


def _sigma_ranges(mixture, sigma_max, lims):
    """Per-parameter plot ranges: hard limits where given, otherwise the
    union of mean +/- sigma_max*sigma over components."""
    out = []
    if lims is None:
        lims = mixture.lims
    if lims is None:
        lims = [(None, None) for _ in range(mixture.dim)]
    for axis, (lower, upper) in enumerate(lims):
        span_lo = span_hi = None
        if lower is None or upper is None:
            for mean, cov in zip(mixture.means, mixture.covs):
                sigma = np.sqrt(cov[axis, axis])
                lo, hi = mean[axis] - sigma_max * sigma, mean[axis] + sigma_max * sigma
                if lower is not None:
                    hi = max(hi, lower + sigma_max * sigma)
                if upper is not None:
                    lo = min(lo, upper - sigma_max * sigma)
                span_lo = lo if span_lo is None else min(lo, span_lo)
                span_hi = hi if span_hi is None else max(hi, span_hi)
        out.append((span_lo if lower is None else lower, span_hi if upper is None else upper))
    return out


def _condition_component(mean, cov, invcov, fixed, kept, values):
    """One component of a conditional mixture: (new_mean, new_cov, -2lnw)."""
    deltas = np.asarray(values) - mean[fixed]
    new_cov = np.linalg.inv(invcov[np.ix_(kept, kept)])
    new_mean = mean[kept] - new_cov.dot(invcov[np.ix_(kept, fixed)].dot(deltas))
    schur = cov[np.ix_(fixed, fixed)] - cov[np.ix_(fixed, kept)].dot(
        np.linalg.inv(cov[np.ix_(kept, kept)]).dot(cov[np.ix_(kept, fixed)])
    )
    logw = invcov[np.ix_(fixed, fixed)].dot(deltas).dot(deltas) + np.log(np.linalg.det(schur))
    return new_mean, new_cov, logw


# ---------------------------------------------------------------------------
# mixture classes
# ---------------------------------------------------------------------------


class MixtureND:
    """Gaussian mixture with optional per-parameter hard limits; supports
    sampling, pdf evaluation, projection and conditioning."""

    def __init__(self, means, covs, weights=None, lims=None, names=None, label="", labels=None):
        """
        :param means: list of component means
        :param covs: list of component covariance matrices
        :param weights: component weights (default equal)
        :param lims: [[min, max], ...] hard limits per parameter (None = none)
        :param names: parameter names (default param1, param2...)
        :param label: label for the mixture
        :param labels: latex labels per parameter
        """
        self.means = np.asarray(means)
        self.dim = self.means.shape[1]
        self.covs = [np.array(cov) for cov in covs]
        self.invcovs = [np.linalg.inv(cov) for cov in self.covs]
        if weights is None:
            weights = [1.0 / len(means)] * len(means)
        self.weights = np.array(weights, dtype=np.float64)
        if np.sum(self.weights) <= 0:
            raise ValueError("Weight <= 0 in MixtureND")
        self.weights /= np.sum(weights)
        self.norms = (2 * np.pi) ** (0.5 * self.dim) * np.array([np.sqrt(np.linalg.det(cov)) for cov in self.covs])
        self.lims = lims
        self.paramNames = ParamNames(names=names, default=self.dim, labels=labels)
        self.names = self.paramNames.list()
        self.label = label
        self.total_mean = np.atleast_1d(np.dot(self.weights, self.means))
        self.total_cov = np.zeros((self.dim, self.dim))
        for mean, cov, weight, totmean in zip(self.means, self.covs, self.weights, self.total_mean):
            self.total_cov += weight * (cov + np.outer(mean - totmean, mean - totmean))

    def sim(self, size, random_state=None):
        """Independent samples from the mixture (rejection sampling when
        hard limits are set)."""
        return _rejection_sample(self, size, random_state)

    def MCSamples(self, size, names=None, logLikes=False, random_state=None, **kwargs):
        """Draw samples and wrap them in an :class:`~.mcsamples.MCSamples`
        ready for plotting."""
        samples = self.sim(size, random_state=random_state)
        loglikes = -np.log(self.pdf(samples)) if logLikes else None
        return MCSamples(
            samples=samples,
            loglikes=loglikes,
            paramNamesFile=copy.deepcopy(self.paramNames),
            names=names,
            ranges=self.lims,
            **kwargs,
        )

    def autoRanges(self, sigma_max=4, lims=None):
        return _sigma_ranges(self, sigma_max, lims)

    def pdf(self, x):
        """Mixture pdf at x (assumes x inside any boundaries; normalized
        only when there are no boundaries)."""
        return _mixture_pdf(self.means, self.invcovs, self.weights, self.norms, x)

    def pdf_marged(self, index, x, no_limit_marge=False):
        """Analytic 1D marginal pdf (requires no limits on marginalized
        parameters)."""
        if isinstance(index, str):
            index = self.names.index(index)
        if not no_limit_marge:
            self.checkNoLimits([index])
        return _marginal_pdf(self.means, self.covs, self.weights, index, x)

    def density1D(self, index=0, num_points=1024, sigma_max=4, no_limit_marge=False):
        """Analytic marginalized Density1D grid."""
        if isinstance(index, str):
            index = self.names.index(index)
        if not no_limit_marge:
            self.checkNoLimits([index])
        lo, hi = self.autoRanges(sigma_max)[index]
        grid = np.linspace(lo, hi, num_points)
        return Density1D(grid, self.pdf_marged(index, grid))

    def density2D(self, params=None, num_points=1024, xmin=None, xmax=None, ymin=None, ymax=None, sigma_max=5):
        """Analytic marginalized Density2D grid for a pair of parameters."""
        if self.dim > 2 or params is not None or not isinstance(self, Mixture2D):
            mixture = self.marginalizedMixture(params=params)
        elif self.dim != 2:
            raise Exception("density2D requires at least two dimensions")
        else:
            mixture = self
        return mixture._density2D(num_points=num_points, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax, sigma_max=sigma_max)

    def _params_to_indices(self, params):
        if params is None:
            params = self.names
        out = []
        for p in params:
            if isinstance(p, str):
                out.append(self.names.index(p))
            elif hasattr(p, "name"):
                out.append(self.names.index(p.name))
            else:
                out.append(p)
        return out

    def marginalizedMixture(self, params, label=None, no_limit_marge=False) -> "MixtureND":
        """Reduced mixture marginalized to the given parameters."""
        indices = self._params_to_indices(params)
        if not no_limit_marge:
            self.checkNoLimits(indices)
        indices = np.array(indices)
        names = [self.names[i] for i in indices] if self.names is not None else None
        lims = [self.lims[i] for i in indices] if self.lims is not None else None
        if label is None:
            label = self.label
        sub_covs = [cov[np.ix_(indices, indices)] for cov in self.covs]
        sub_means = [mean[indices] for mean in self.means]
        klass = Mixture2D if len(indices) == 2 else MixtureND
        reduced = klass(sub_means, sub_covs, self.weights, lims=lims, names=names, label=label)
        reduced.paramNames.setLabelsAndDerivedFromParamNames(self.paramNames)
        return reduced

    def conditionalMixture(self, fixed_params, fixed_param_values, label=None):
        """Conditional mixture with some parameters fixed: covariances are
        inverses of the projected inverse covariances, means shifted, and
        component weights reweighted by the conditioning likelihood."""
        fixed = self._params_to_indices(fixed_params)
        self.checkNoLimits(fixed)
        kept = [i for i in range(self.dim) if i not in fixed]
        if not len(kept):
            raise ValueError("conditionalMixture must leave at least one non-fixed parameter")
        cond_means, cond_covs, logws = [], [], []
        for mean, cov, invcov in zip(self.means, self.covs, self.invcovs):
            new_mean, new_cov, logw = _condition_component(mean, cov, invcov, fixed, kept, fixed_param_values)
            cond_means.append(new_mean)
            cond_covs.append(new_cov)
            logws.append(logw)
        cond_weights = np.exp(-(np.asarray(logws) - min(logws)) / 2)
        names = [self.names[i] for i in kept] if self.names is not None else None
        conditioned = MixtureND(cond_means, cond_covs, cond_weights, names=names, label=label)
        conditioned.paramNames.setLabelsAndDerivedFromParamNames(self.paramNames)
        return conditioned

    def checkNoLimits(self, keep_params):
        if self.lims is None:
            return
        for i, lim in enumerate(self.lims):
            if i not in keep_params and (lim[0] is not None or lim[1] is not None):
                raise Exception("In general can only marginalize analytically if no hard boundary limits: " + self.label)

    def getUpper(self, name):
        if self.lims is None:
            return None
        return self.lims[self.names.index(name)][1]

    def getLower(self, name):
        if self.lims is None:
            return None
        return self.lims[self.names.index(name)][0]


class Mixture2D(MixtureND):
    """2D Gaussian mixture with optional x/y bounds; covariances can be
    given as [sigma_x, sigma_y, corr] triplets."""

    def __init__(
        self, means, covs, weights=None, lims=None, names=("x", "y"), xmin=None, xmax=None, ymin=None, ymax=None, **kwargs
    ):
        if lims is not None:
            limits = self._updateLimits(lims, xmin, xmax, ymin, ymax)
        else:
            limits = [(xmin, xmax), (ymin, ymax)]
        expanded = [
            make_2D_Cov(*cov)
            if isinstance(cov, (list, tuple)) and len(cov) == 3 and not isinstance(cov[0], (list, tuple))
            else cov
            for cov in covs
        ]
        super().__init__(means, expanded, weights, limits, names=names, **kwargs)

    def _updateLimits(self, lims, xmin=None, xmax=None, ymin=None, ymax=None):
        xlo = xmin if xmin is not None else lims[0][0]
        xhi = xmax if xmax is not None else lims[0][1]
        ylo = ymin if ymin is not None else lims[1][0]
        yhi = ymax if ymax is not None else lims[1][1]
        return [(xlo, xhi), (ylo, yhi)]

    def _density2D(self, num_points=1024, xmin=None, xmax=None, ymin=None, ymax=None, sigma_max=5):
        bounds = self._updateLimits(self.lims, xmin, xmax, ymin, ymax)
        (xlo, xhi), (ylo, yhi) = self.autoRanges(sigma_max, lims=bounds)
        gx = np.linspace(xlo, xhi, num_points)
        gy = np.linspace(ylo, yhi, num_points)
        xx, yy = np.meshgrid(gx, gy)
        return Density2D(gx, gy, self.pdf(xx, yy))

    def pdf(self, x, y=None):
        """pdf at (x, y), or the 1D x-marginal when y is omitted."""
        if y is None:
            return super().pdf(x)
        total = None
        for i, (mean, icov, weight, norm) in enumerate(zip(self.means, self.invcovs, self.weights, self.norms)):
            dx = x - mean[0]
            dy = y - mean[1]
            component = np.exp(-(dx**2 * icov[0, 0] + 2 * dx * dy * icov[0, 1] + dy**2 * icov[1, 1]) / 2) / norm
            total = component * weight if not i else total + component * weight
        return total


class Gaussian2D(Mixture2D):
    """Single 2D Gaussian."""

    def __init__(self, mean, cov, **kwargs):
        super().__init__([mean], [cov], **kwargs)


class GaussianND(MixtureND):
    """Single ND Gaussian; mean/cov may be text filenames, and cov may be
    an inverse covariance."""

    def __init__(self, mean, cov, is_inv_cov=False, **kwargs):
        if isinstance(mean, str):
            mean = np.loadtxt(mean)
        if isinstance(cov, str):
            cov = np.loadtxt(cov)
        if is_inv_cov:
            cov = np.linalg.inv(cov)
        super().__init__([mean], [cov], **kwargs)


class Mixture1D(MixtureND):
    """1D Gaussian mixture with optional bounds."""

    def __init__(self, means, sigmas, weights=None, lims=None, name="x", xmin=None, xmax=None, **kwargs):
        if lims is not None:
            limits = [(xmin if xmin is not None else lims[0], xmax if xmax is not None else lims[1])]
        else:
            limits = [(xmin, xmax)]
        super().__init__(
            [[mean] for mean in means],
            [np.atleast_2d(sigma**2) for sigma in sigmas],
            weights,
            limits,
            names=[name],
            **kwargs,
        )

    def pdf(self, x):
        return self.pdf_marged(0, x)


class Gaussian1D(Mixture1D):
    """Single 1D Gaussian."""

    def __init__(self, mean, sigma, **kwargs):
        super().__init__([mean], [sigma], **kwargs)


class RandomTestMixtureND(MixtureND):
    """Randomly-generated ND mixture (random parameters) for tests."""

    def __init__(self, ndim=4, ncomponent=1, names=None, weights=None, seed=None, label="RandomMixture"):
        rng = np.random.default_rng(seed)
        covs = []
        for _ in range(ncomponent):
            A = rng.random((ndim, ndim))
            covs.append(np.dot(A, A.T))
        super().__init__(rng.random((ncomponent, ndim)), covs, weights=weights, lims=None, names=names, label=label)


def randomTestMCSamples(ndim=4, ncomponent=1, nsamp=10009, nMCSamples=1, seed=10, names=None, labels=None):
    """MCSamples instance(s) drawn from random test mixtures."""
    if names is None:
        names = ["x%s" % i for i in range(ndim)]
    if labels is None:
        labels = ["x_{%s}" % i for i in range(ndim)]
    seed = np.random.default_rng(seed)
    result = [
        RandomTestMixtureND(ndim, ncomponent, names, seed=seed).MCSamples(
            nsamp, labels=labels, name_tag="Sim %s" % (i + 1), random_state=seed
        )
        for i in range(nMCSamples)
    ]
    return result if nMCSamples > 1 else result[0]
