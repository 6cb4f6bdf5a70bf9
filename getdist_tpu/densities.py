"""Probability density grids: containers, credible intervals, contour levels.

Host-facing layer consuming device-computed KDE grids (the plotting API
surface of the reference's ``getdist/densities.py``). Grids are small
(1024 / 256^2), so interpolation and limit-finding run host-side on numpy /
scipy splines; the batched device path has its own contour-level kernel in
``getdist_tpu.ops.kde``.

Semantics match the reference: water-level contour levels by sort + cumsum
with half-weighted edge bins, spline-upsampled equal-density credible
intervals, and trapezoid-ish integrators with 2^-codimension edge weights.
"""

from collections.abc import Sequence

import numpy as np
from scipy.interpolate import LinearNDInterpolator, RectBivariateSpline, splev, splrep

__all__ = ["Density1D", "Density2D", "DensityND", "GridDensity", "getContourLevels", "DensitiesError"]


class DensitiesError(Exception):
    pass


defaultContours = (0.68, 0.95)


class InterpGridCache:
    __slots__ = "bign", "cumsum", "factor", "grid", "norm", "softgrid", "sortgrid"


def getContourLevels(inbins, contours=defaultContours, missing_norm=0, half_edge=True):
    """Density levels enclosing the given probability fractions.

    Water-level method (reference ``densities.py:19-56``): sort the bin
    values, accumulate, and interpolate where the cumulative mass outside
    crosses (1 - contour) * norm. Edge bins count half per boundary
    dimension when half_edge is set.

    :param inbins: binned density (any dimension)
    :param contours: confidence fractions to solve for
    :param missing_norm: probability mass not inside inbins
    :param half_edge: half-weight edge bins in each direction
    :return: array of density levels
    """
    if half_edge:
        abins = np.array(inbins)
        for axis in range(abins.ndim):
            first = [slice(None)] * abins.ndim
            last = [slice(None)] * abins.ndim
            first[axis] = 0
            last[axis] = -1
            abins[tuple(first)] /= 2
            abins[tuple(last)] /= 2
    else:
        abins = np.asarray(inbins)
    norm = np.sum(abins)
    targets = (1 - np.asarray(contours)) * norm - missing_norm
    flat = abins.reshape(-1)
    order = np.asarray(inbins).reshape(-1).argsort()
    sortgrid = flat[order]
    cumsum = np.cumsum(sortgrid)
    ixs = np.searchsorted(cumsum, targets)
    levels = np.zeros(len(targets))
    for i, ix in enumerate(ixs):
        if ix == 0:
            raise DensitiesError("Contour level outside plotted ranges")
        h = cumsum[ix] - cumsum[ix - 1]
        d = (cumsum[ix] - targets[i]) / h
        levels[i] = sortgrid[ix] * (1 - d) + d * sortgrid[ix - 1]
    return levels


class GridDensity:
    """Base for density grids (normalized or not).

    :ivar P: array of density values
    """

    norm: float
    axes: Sequence[np.ndarray]
    view_ranges: Sequence[Sequence[float]]

    def setP(self, P=None):
        """Set grid values (validates shape against the axes)."""
        if P is not None:
            P = np.asarray(P)
            for size, ax in zip(P.shape, self.axes):
                if size != ax.size:
                    raise DensitiesError(f"Array size mismatch in Density arrays: P {size}, axis {ax.size}")
            self.P = P
        else:
            self.P = np.zeros([ax.size for ax in self.axes])
        self.spl = None

    def normalize(self, by="integral", in_place=False):
        """Normalize by 'integral' (unit mass) or 'max' (peak = 1)."""
        if by == "integral":
            norm = self.norm_integral()
        elif by == "max":
            norm = np.max(self.P)
            if norm == 0:
                raise DensitiesError("no samples in bin")
        else:
            raise DensitiesError("Density: unknown normalization")
        if in_place:
            self.P /= norm
        else:
            self.setP(self.P / norm)
        self.spl = None
        return self

    def bounds(self):
        """(min, max) per axis in x, y, z order."""
        if self.view_ranges is not None:
            return self.view_ranges
        b = [(ax[0], ax[-1]) for ax in self.axes]
        b.reverse()
        return b

    def getContourLevels(self, contours=defaultContours):
        """Contour levels for the given confidence fractions."""
        return getContourLevels(self.P, contours)


class Density1D(GridDensity):
    """1D marginalized density on a uniform grid; callable for interpolated
    values, with equal-density credible-interval solving."""

    def __init__(self, x, P=None, view_ranges=None):
        """
        :param x: grid of x values
        :param P: density values at x
        :param view_ranges: optional viewing range
        """
        self.n = x.size
        self.x = np.asarray(x)
        self.axes = [self.x]
        self.view_ranges = view_ranges
        self.spacing = x[1] - x[0]
        self.setP(P)

    def bounds(self):
        """(min, max) of the x range (or view_ranges)."""
        if self.view_ranges is not None:
            return self.view_ranges
        return self.x[0], self.x[-1]

    def _initSpline(self):
        self.spl = splrep(self.x, self.P, s=0)

    def Prob(self, x, derivative=0):
        """Interpolated density (or derivative) at x."""
        if self.spl is None:
            self._initSpline()
        if isinstance(x, (np.ndarray, list, tuple)):
            return splev(x, self.spl, derivative, ext=1)
        return splev([x], self.spl, derivative, ext=1)[0]

    __call__ = Prob

    def integrate(self, P):
        return ((P[0] + P[-1]) / 2 + np.sum(P[1:-1])) * self.spacing

    def norm_integral(self):
        return self.integrate(self.P)

    def initLimitGrids(self, factor=None):
        """Build the up-sampled spline grid cache used by getLimits."""
        if self.spl is None:
            self._initSpline()
        g = InterpGridCache()
        g.factor = factor if factor is not None else max(2, 20000 // self.n)
        g.bign = (self.n - 1) * g.factor + 1
        vecx = self.x[0] + np.arange(g.bign) * self.spacing / g.factor
        g.grid = splev(vecx, self.spl)
        g.norm = np.sum(g.grid) - 0.5 * self.P[-1] - 0.5 * self.P[0]
        g.sortgrid = np.sort(g.grid)
        g.cumsum = np.cumsum(g.sortgrid)
        return g

    def getLimits(self, p, interpGrid=None, accuracy_factor=None):
        """Equal-density credible interval(s).

        :param p: confidence fraction or list of them
        :param interpGrid: optional cache from initLimitGrids
        :param accuracy_factor: up-sampling factor override
        :return: (min, max, lim_bot, lim_top) where the booleans mark limits
            that hit the grid edge (one-tail cases); list when p is a list
        """
        g = interpGrid or self.initLimitGrids(accuracy_factor)
        parr = np.atleast_1d(p)
        targets = (1 - parr) * g.norm
        ixs = np.searchsorted(g.cumsum, targets)
        results = []
        for ix, target in zip(ixs, targets):
            trial = g.sortgrid[ix]
            if ix > 0:
                d = g.cumsum[ix] - g.cumsum[ix - 1]
                frac = (g.cumsum[ix] - target) / d
                trial = (1 - frac) * trial + frac * g.sortgrid[ix + 1]
            finespace = self.spacing / g.factor
            lim_bot = g.grid[0] >= trial
            if lim_bot:
                mn = self.x[0]
            else:
                i = np.argmax(g.grid > trial)
                d = (g.grid[i] - trial) / (g.grid[i] - g.grid[i - 1])
                mn = self.x[0] + (i - d) * finespace
            lim_top = g.grid[-1] >= trial
            if lim_top:
                mx = self.x[-1]
            else:
                i = g.bign - np.argmax(g.grid[::-1] > trial) - 1
                d = (g.grid[i] - trial) / (g.grid[i] - g.grid[i + 1])
                mx = self.x[0] + (i + d) * finespace
            if parr is not p:
                return mn, mx, lim_bot, lim_top
            results.append((mn, mx, lim_bot, lim_top))
        return results


class Density2D(GridDensity):
    """2D marginalized density on a rectangular grid; callable like a
    RectBivariateSpline."""

    def __init__(self, x, y, P=None, view_ranges=None, mask=None):
        """
        :param x: x grid
        :param y: y grid
        :param P: (ny, nx) density values
        :param view_ranges: optional [(xmin,xmax),(ymin,ymax)]
        :param mask: optional boolean mask for non-rectangular priors
        """
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.axes = [self.y, self.x]
        self.view_ranges = view_ranges
        self.mask = mask
        self.spacing = (self.x[1] - self.x[0]) * (self.y[1] - self.y[0])
        self.setP(P)

    def integrate(self, P):
        norm = (
            np.sum(P[1:-1, 1:-1])
            + (P[0, 0] + P[0, -1] + P[-1, 0] + P[-1, -1]) / 4.0
            + (np.sum(P[1:-1, 0]) + np.sum(P[0, 1:-1]) + np.sum(P[1:-1, -1]) + np.sum(P[-1, 1:-1])) / 2.0
        )
        return norm * self.spacing

    def norm_integral(self):
        return self.integrate(self.P)

    def _initSpline(self):
        self.spl = RectBivariateSpline(self.x, self.y, self.P.T, s=0)

    def Prob(self, x, y, grid=False):
        """Interpolated density at (x, y)."""
        return self.__call__(x, y, grid=grid)

    def __call__(self, *args, **kwargs):
        if self.spl is None:
            self._initSpline()
        return self.spl(*args, **kwargs)


class DensityND(GridDensity):
    """ND marginalized density with linear interpolation."""

    def __init__(self, xs, P=None, view_ranges=None):
        """
        :param xs: list of per-dimension grids
        :param P: ND density values
        :param view_ranges: optional per-dimension view ranges
        """
        self.dim = len(xs)
        self.x = xs[0]
        if self.dim >= 2:
            self.y = xs[1]
        if self.dim >= 3:
            self.z = xs[2]
        self.xs = xs
        self.axes = xs[::-1]
        self.view_ranges = view_ranges
        self.spacing = 1.0
        for ax in xs:
            self.spacing *= ax[1] - ax[0]
        self.setP(P)

    def integrate(self, P):
        # Edge hypersurfaces of codimension c get weight 2^-c.
        ndim = P.ndim
        norm = 0.0
        weights = np.ones(P.shape)
        for axis in range(ndim):
            shape = [1] * ndim
            shape[axis] = P.shape[axis]
            w = np.ones(P.shape[axis])
            w[0] = w[-1] = 0.5
            weights = weights * w.reshape(shape)
        norm = np.sum(P * weights)
        return norm

    def norm_integral(self):
        return self.integrate(self.P)

    def _initSpline(self):
        self.spl = LinearNDInterpolator(self.xs, self.P.T, rescale=True)

    def Prob(self, xs):
        """Interpolated density at the points xs."""
        if self.spl is None:
            self._initSpline()
        return self.spl(xs)

    __call__ = Prob
