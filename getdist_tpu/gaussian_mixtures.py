"""Gaussian mixture models: analytic truth distributions and Fisher-style
plotting inputs.

Behavior-compatible with the reference ``getdist/gaussian_mixtures.py``:
mixtures with optional hard limits support pdf evaluation, analytic 1D/2D
density grids, marginalization and conditioning, rejection sampling under
bounds, and minting of :class:`~.mcsamples.MCSamples` objects. Sampling uses
numpy Generators with the same call sequence as the reference so seeded test
fixtures are bit-reproducible.
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
        tot = 0
        res = []
        block = None
        random_state = np.random.default_rng(random_state)
        while True:
            for num, mean, cov in zip(random_state.multinomial(block or size, self.weights), self.means, self.covs):
                if num > 0:
                    v = random_state.multivariate_normal(mean, cov, size=num)
                    if self.lims is not None:
                        for i, (mn, mx) in enumerate(self.lims):
                            if mn is not None:
                                v = v[v[:, i] >= mn]
                            if mx is not None:
                                v = v[v[:, i] <= mx]
                    tot += v.shape[0]
                    res.append(v)
            if tot >= size:
                break
            if block is None:
                block = min(max(size, 100000), int(1.1 * (size * (size - tot))) // max(tot, 1) + 1)
        samples = np.vstack(res)
        if len(res) > 1:
            samples = random_state.permutation(samples)
        if tot != size:
            samples = samples[: -(tot - size), :]
        return samples

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
        res = []
        if lims is None:
            lims = self.lims
        if lims is None:
            lims = [(None, None) for _ in range(self.dim)]
        for i, (mn, mx) in enumerate(lims):
            covmin = None
            covmax = None
            if mn is None or mx is None:
                for mean, cov in zip(self.means, self.covs):
                    sigma = np.sqrt(cov[i, i])
                    xmin, xmax = mean[i] - sigma_max * sigma, mean[i] + sigma_max * sigma
                    if mn is not None:
                        xmax = max(xmax, mn + sigma_max * sigma)
                    if mx is not None:
                        xmin = min(xmin, mx - sigma_max * sigma)
                    covmin = min(xmin, covmin) if covmin is not None else xmin
                    covmax = max(xmax, covmax) if covmax is not None else xmax
            res.append((covmin if mn is None else mn, covmax if mx is None else mx))
        return res

    def pdf(self, x):
        """Mixture pdf at x (assumes x inside any boundaries; normalized
        only when there are no boundaries)."""
        tot = None
        x = np.asarray(x)
        for i, (mean, icov, weight, norm) in enumerate(zip(self.means, self.invcovs, self.weights, self.norms)):
            dx = x - mean
            if len(x.shape) == 1:
                res = np.exp(-icov.dot(dx).dot(dx) / 2) / norm
            else:
                res = np.exp(-np.einsum("ik,km,im->i", dx, icov, dx) / 2) / norm
            tot = res * weight if not i else tot + res * weight
        return tot

    def pdf_marged(self, index, x, no_limit_marge=False):
        """Analytic 1D marginal pdf (requires no limits on marginalized
        parameters)."""
        if isinstance(index, str):
            index = self.names.index(index)
        if not no_limit_marge:
            self.checkNoLimits([index])
        tot = None
        for i, (mean, cov, weight) in enumerate(zip(self.means, self.covs, self.weights)):
            dx = x - mean[index]
            var = cov[index, index]
            res = np.exp(-(dx**2) / var / 2) / np.sqrt(2 * np.pi * var)
            tot = res * weight if not i else tot + res * weight
        return tot

    def density1D(self, index=0, num_points=1024, sigma_max=4, no_limit_marge=False):
        """Analytic marginalized Density1D grid."""
        if isinstance(index, str):
            index = self.names.index(index)
        if not no_limit_marge:
            self.checkNoLimits([index])
        mn, mx = self.autoRanges(sigma_max)[index]
        x = np.linspace(mn, mx, num_points)
        return Density1D(x, self.pdf_marged(index, x))

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
        indices = []
        if params is None:
            params = self.names
        for p in params:
            if isinstance(p, str):
                indices.append(self.names.index(p))
            elif hasattr(p, "name"):
                indices.append(self.names.index(p.name))
            else:
                indices.append(p)
        return indices

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
        covs = [cov[np.ix_(indices, indices)] for cov in self.covs]
        means = [mean[indices] for mean in self.means]
        tp = Mixture2D if len(indices) == 2 else MixtureND
        mixture = tp(means, covs, self.weights, lims=lims, names=names, label=label)
        mixture.paramNames.setLabelsAndDerivedFromParamNames(self.paramNames)
        return mixture

    def conditionalMixture(self, fixed_params, fixed_param_values, label=None):
        """Conditional mixture with some parameters fixed: covariances are
        inverses of the projected inverse covariances, means shifted, and
        component weights reweighted by the conditioning likelihood."""
        fixed_params = self._params_to_indices(fixed_params)
        self.checkNoLimits(fixed_params)
        keep_params = [i for i in range(self.dim) if i not in fixed_params]
        if not len(keep_params):
            raise ValueError("conditionalMixture must leave at least one non-fixed parameter")
        new_means = []
        new_covs = []
        new_weights = []
        for mean, cov, invcov, weight in zip(self.means, self.covs, self.invcovs, self.weights):
            deltas = np.asarray(fixed_param_values) - mean[fixed_params]
            new_cov = np.linalg.inv(invcov[np.ix_(keep_params, keep_params)])
            new_mean = mean[keep_params] - new_cov.dot(invcov[np.ix_(keep_params, fixed_params)].dot(deltas))
            logw = invcov[np.ix_(fixed_params, fixed_params)].dot(deltas).dot(deltas) + np.log(
                np.linalg.det(
                    cov[np.ix_(fixed_params, fixed_params)]
                    - cov[np.ix_(fixed_params, keep_params)].dot(
                        np.linalg.inv(cov[np.ix_(keep_params, keep_params)]).dot(cov[np.ix_(keep_params, fixed_params)])
                    )
                )
            )
            new_weights.append(logw)
            new_means.append(new_mean)
            new_covs.append(new_cov)

        new_weights = np.exp(-(np.asarray(new_weights) - min(new_weights)) / 2)
        names = [self.names[i] for i in keep_params] if self.names is not None else None
        mixture = MixtureND(new_means, new_covs, new_weights, names=names, label=label)
        mixture.paramNames.setLabelsAndDerivedFromParamNames(self.paramNames)
        return mixture

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
        mats = []
        for cov in covs:
            if isinstance(cov, (list, tuple)) and len(cov) == 3 and not isinstance(cov[0], (list, tuple)):
                mats.append(make_2D_Cov(*cov))
            else:
                mats.append(cov)
        super().__init__(means, mats, weights, limits, names=names, **kwargs)

    def _updateLimits(self, lims, xmin=None, xmax=None, ymin=None, ymax=None):
        xmin = xmin if xmin is not None else lims[0][0]
        xmax = xmax if xmax is not None else lims[0][1]
        ymin = ymin if ymin is not None else lims[1][0]
        ymax = ymax if ymax is not None else lims[1][1]
        return [(xmin, xmax), (ymin, ymax)]

    def _density2D(self, num_points=1024, xmin=None, xmax=None, ymin=None, ymax=None, sigma_max=5):
        lims = self._updateLimits(self.lims, xmin, xmax, ymin, ymax)
        (xmin, xmax), (ymin, ymax) = self.autoRanges(sigma_max, lims=lims)
        x = np.linspace(xmin, xmax, num_points)
        y = np.linspace(ymin, ymax, num_points)
        xx, yy = np.meshgrid(x, y)
        return Density2D(x, y, self.pdf(xx, yy))

    def pdf(self, x, y=None):
        """pdf at (x, y), or the 1D x-marginal when y is omitted."""
        if y is None:
            return super().pdf(x)
        tot = None
        for i, (mean, icov, weight, norm) in enumerate(zip(self.means, self.invcovs, self.weights, self.norms)):
            dx = x - mean[0]
            dy = y - mean[1]
            res = np.exp(-(dx**2 * icov[0, 0] + 2 * dx * dy * icov[0, 1] + dy**2 * icov[1, 1]) / 2) / norm
            tot = res * weight if not i else tot + res * weight
        return tot


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
        covs = [np.atleast_2d(sigma**2) for sigma in sigmas]
        means = [[mean] for mean in means]
        super().__init__(means, covs, weights, limits, names=[name], **kwargs)

    def pdf(self, x):
        return self.pdf_marged(0, x)


class Gaussian1D(Mixture1D):
    """Single 1D Gaussian."""

    def __init__(self, mean, sigma, **kwargs):
        super().__init__([mean], [sigma], **kwargs)


class RandomTestMixtureND(MixtureND):
    """Randomly-generated ND mixture (random parameters) for tests."""

    def __init__(self, ndim=4, ncomponent=1, names=None, weights=None, seed=None, label="RandomMixture"):
        random_state = np.random.default_rng(seed)
        covs = []
        for _ in range(ncomponent):
            A = random_state.random((ndim, ndim))
            covs.append(np.dot(A, A.T))
        super().__init__(
            random_state.random((ncomponent, ndim)), covs, weights=weights, lims=None, names=names, label=label
        )


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
