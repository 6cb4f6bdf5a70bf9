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
        self.paramNames = paramNames or []
        self.size = matrix.shape[0] if matrix is not None else 0
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
            self.paramNames = header[1:].split()
            self.size = len(self.paramNames)
            self.matrix = np.loadtxt(handle)

    def saveToFile(self, filename):
        """Write the .covmat text format (names header + %15.7E matrix)."""
        with open(filename, "wb") as handle:
            handle.write(("# " + self.paramNameString() + "\n").encode("utf-8"))
            np.savetxt(handle, self.matrix, "%15.7E")

    def rescaleParameter(self, name, scale):
        """Rescale row+column of one parameter (for renormalized parameters)."""
        if name not in self.paramNames:
            print("Not in covmat: " + name)
            return
        i = self.paramNames.index(name)
        self.matrix[:, i] *= scale
        self.matrix[i, :] *= scale

    def mergeCovmatWhereNew(self, cov2):
        """Union of parameters: keep this matrix's entries where present,
        fill blocks only covered by cov2 from cov2, zero cross terms."""
        merged = CovMat()
        merged.paramNames = list(self.paramNames)
        merged.paramNames += [p for p in cov2.paramNames if p not in merged.paramNames]
        n = len(merged.paramNames)
        own = {p: i for i, p in enumerate(self.paramNames)}
        other = {p: i for i, p in enumerate(cov2.paramNames)}
        merged.matrix = np.zeros((n, n))
        for i, pi in enumerate(merged.paramNames):
            for j, pj in enumerate(merged.paramNames):
                if pi in own and pj in own:
                    merged.matrix[i, j] = self.matrix[own[pi], own[pj]]
                elif pi in other and pj in other:
                    merged.matrix[i, j] = cov2.matrix[other[pi], other[pj]]
        return merged

    def correlation(self):
        """The correlation matrix derived from this covariance."""
        sigma = np.sqrt(np.diag(self.matrix))
        return self.matrix / np.outer(sigma, sigma)

    def plot(self):
        """Plot the correlation matrix as a colored grid."""
        import matplotlib.pyplot as plt

        plt.pcolor(self.correlation())
        plt.colorbar()
        ticks = np.arange(0.5, self.size + 0.5)
        plt.yticks(ticks, list(range(1, self.size + 1)))
        plt.gca().set_yticklabels(self.paramNames)
        plt.xticks(ticks, list(range(1, self.size + 1)))
        plt.xlim([0, self.size])
        plt.ylim([0, self.size])
