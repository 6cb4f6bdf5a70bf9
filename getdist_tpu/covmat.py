"""Named-parameter covariance matrices (host-side; ``.covmat`` text format).

Format compatible with the reference (``getdist/covmat.py``): a
``# name1 name2 ...`` header line followed by the matrix in ``%15.7E``
columns.
"""

import numpy as np

__all__ = ["CovMat"]


class CovMat:
    """Covariance matrix labeled by parameter names.

    :ivar matrix: square numpy array
    :ivar paramNames: list of parameter name strings
    """

    def __init__(self, filename="", matrix=None, paramNames=None):
        self.matrix = matrix
        self.size = matrix.shape[0] if matrix is not None else 0
        self.paramNames = paramNames or []
        if filename:
            self.loadFromFile(filename)

    def paramNameString(self):
        return " ".join(self.paramNames)

    def loadFromFile(self, filename):
        """Load a .covmat text file; the first line must be a '#'-prefixed
        header of parameter names."""
        with open(filename, encoding="utf-8-sig") as handle:
            header = handle.readline().strip()
            if not header.startswith("#"):
                raise Exception(".covmat must now have parameter names header")
            self.paramNames = header.lstrip("#").split()
            self.size = len(self.paramNames)
            self.matrix = np.loadtxt(handle)

    def saveToFile(self, filename):
        """Write the .covmat text format (names header + %15.7E matrix)."""
        with open(filename, "wb") as handle:
            handle.write(("# %s\n" % self.paramNameString()).encode("utf-8"))
            np.savetxt(handle, self.matrix, "%15.7E")

    def rescaleParameter(self, name, scale):
        """Rescale row+column of one parameter (for renormalized parameters)."""
        try:
            where = self.paramNames.index(name)
        except ValueError:
            print("Not in covmat: " + name)
            return
        self.matrix[where, :] *= scale
        self.matrix[:, where] *= scale

    def mergeCovmatWhereNew(self, cov2):
        """Union of parameters: keep this matrix's entries where present,
        fill blocks only covered by cov2 from cov2, zero cross terms."""
        names = list(self.paramNames)
        names += [p for p in cov2.paramNames if p not in names]
        n = len(names)
        slot = {p: i for i, p in enumerate(names)}
        merged = CovMat(matrix=np.zeros((n, n)), paramNames=names)
        # write cov2's block first, then overwrite with this matrix's block
        # (earlier matrix wins on overlap); cross terms stay zero
        for source in (cov2, self):
            where = np.array([slot[p] for p in source.paramNames], dtype=int)
            merged.matrix[np.ix_(where, where)] = source.matrix
        return merged

    def correlation(self):
        """The correlation matrix derived from this covariance."""
        sigma = np.sqrt(np.diag(self.matrix))
        return self.matrix / np.outer(sigma, sigma)

    def plot(self):
        """Plot the correlation matrix as a colored grid."""
        from matplotlib import pyplot

        pyplot.pcolor(self.correlation())
        pyplot.colorbar()
        centers = 0.5 + np.arange(self.size)
        numbers = [str(i) for i in range(1, self.size + 1)]
        pyplot.yticks(centers, numbers)
        pyplot.gca().set_yticklabels(self.paramNames)
        pyplot.xticks(centers, numbers)
        pyplot.xlim([0, self.size])
        pyplot.ylim([0, self.size])
