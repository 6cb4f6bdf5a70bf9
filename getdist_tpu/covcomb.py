"""Merge .covmat files (earlier inputs take priority where parameters overlap).

Usage: python -m getdist_tpu.covcomb out.covmat in1.covmat in2.covmat [...]
(reference ``getdist/covcomb.py``).
"""

import sys

from getdist_tpu import covmat


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("Usage: python -m getdist_tpu.covcomb out.covmat in1.covmat in2.covmat [in3.covmat...]")
        return 1
    foutname = argv[0]
    cov = covmat.CovMat(argv[1])
    for fname in argv[2:]:
        print("merging: " + fname)
        cov = cov.mergeCovmatWhereNew(covmat.CovMat(fname))
    cov.saveToFile(foutname)
    return 0


if __name__ == "__main__":
    sys.exit(main())
