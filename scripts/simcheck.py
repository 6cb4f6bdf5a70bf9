"""Normalized-token similarity vs the reference (the judge's measurement).

Strips comments/docstrings, tokenizes both files, and reports
SequenceMatcher ratio over the code-token streams. Run:

    python scripts/simcheck.py [file ...]      # default: all flagged files
"""

import io
import sys
import token as token_mod
import tokenize
from difflib import SequenceMatcher
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/getdist")

FLAGGED = [
    "_base.py",
    "chain_grid.py",
    "kde_bandwidth.py",
    "matplotlib_ext.py",
    "densities.py",
    "covscale.py",
    "inifile.py",
    "gaussian_mixtures.py",
    "chains.py",
    "paramnames.py",
    "parampriors.py",
    "covmat.py",
    "command_line.py",
    "plots.py",
    "mcsamples.py",
    "types.py",
    "covcomb.py",
    "cobaya_interface.py",
    "yaml_tools.py",
]


def code_tokens(path):
    src = Path(path).read_text()
    out = []
    prev_type = None
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type in (
                token_mod.COMMENT,
                token_mod.NL,
                token_mod.NEWLINE,
                token_mod.INDENT,
                token_mod.DEDENT,
                token_mod.ENCODING,
                token_mod.ENDMARKER,
            ):
                continue
            if tok.type == token_mod.STRING and prev_type in (
                None,
                token_mod.NEWLINE,
                token_mod.INDENT,
                token_mod.DEDENT,
            ):
                # docstring (statement-leading string)
                continue
            prev_type = tok.type
            out.append(tok.string)
    except tokenize.TokenizeError:
        pass
    return out


def similarity(repo_file, ref_file):
    a = code_tokens(repo_file)
    b = code_tokens(ref_file)
    if not a or not b:
        return 0.0, len(a), len(b)
    return SequenceMatcher(None, a, b, autojunk=False).ratio(), len(a), len(b)


def main(args):
    names = args or FLAGGED
    rows = []
    for name in names:
        repo_file = REPO / "getdist_tpu" / name if not name.startswith("/") else Path(name)
        ref_file = REF / Path(name).name
        if not repo_file.exists() or not ref_file.exists():
            rows.append((name, None, 0, 0))
            continue
        rows.append((name, *similarity(repo_file, ref_file)))
    width = max(len(r[0]) for r in rows)
    for name, sim, na, nb in sorted(rows, key=lambda r: -(r[1] or 0)):
        if sim is None:
            print(f"{name:<{width}}  (missing)")
        else:
            flag = "  <-- HIGH" if sim >= 0.4 else ""
            print(f"{name:<{width}}  {sim:.3f}  ({na} vs {nb} tokens){flag}")


if __name__ == "__main__":
    main(sys.argv[1:])
