"""Rescale parameter(s) in every .covmat file in a directory.

Usage: python -m getdist_tpu.covscale in_dir out_dir p1:p2:.. fac1:fac2:..
(reference ``getdist/covscale.py``).
"""

import fnmatch
import os
import sys

from getdist_tpu import covmat


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 4:
        print("covscale rescales parameter(s) in all .covmat files in a directory and outputs to another directory")
        print("Usage: python -m getdist_tpu.covscale in_dir out_dir param1:param2:.. fac1:fac2:..")
        return 1
    indir = os.path.abspath(argv[0]) + os.sep
    outdir = os.path.abspath(argv[1]) + os.sep
    pars = argv[2].split(":")
    factors = argv[3].split(":")
    if not os.path.exists(outdir):
        os.makedirs(outdir)
    for f in os.listdir(indir):
        if fnmatch.fnmatch(f, "*.covmat"):
            print(indir + f)
            cov = covmat.CovMat(indir + f)
            for par, factor in zip(pars, factors):
                cov.rescaleParameter(par, float(factor))
            cov.saveToFile(outdir + f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
