"""Per-function shared-line report for a repo module vs its reference twin.

For each top-level function / method in the repo file, counts how many of its
stripped non-comment lines appear anywhere in the reference file (unordered).
Used to target re-derivation work at the bodies that still carry reference
provenance.

Usage: python scripts/simfuncs.py getdist_tpu/plots.py [min_shared]
"""

from __future__ import annotations

import ast
import sys
from collections import Counter
from pathlib import Path

from simcheck import PAIRS
from simlines import stripped_lines

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/getdist")


def main() -> None:
    repo_rel = sys.argv[1]
    min_shared = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rp = REPO / repo_rel
    fp = REF / PAIRS[repo_rel]
    ref_lines = Counter(stripped_lines(fp))

    src = rp.read_text()
    tree = ast.parse(src)
    # map line number -> enclosing function qualname
    spans: list[tuple[int, int, str]] = []

    def visit(node, prefix=""):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                name = prefix + child.name
                spans.append((child.lineno, child.end_lineno, name))
                visit(child, name + ".")
            elif isinstance(child, ast.ClassDef):
                visit(child, prefix + child.name + ".")

    visit(tree)

    # stripped lines of the repo file, with original line numbers retained
    import io
    import token
    import tokenize

    drop: set[int] = set()
    try:
        prev_type = None
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == token.COMMENT:
                if tok.line.strip().startswith("#"):
                    drop.add(tok.start[0])
            elif tok.type == token.STRING and (
                prev_type in (None, token.NEWLINE, token.NL, token.INDENT, token.DEDENT)
                or len(tok.string) > 120
            ):
                drop.update(range(tok.start[0], tok.end[0] + 1))
            if tok.type not in (token.COMMENT, token.NL):
                prev_type = tok.type
    except tokenize.TokenError:
        pass

    per_func: dict[str, list[int]] = {}
    ref_budget = Counter(ref_lines)
    numbered = []
    for i, raw in enumerate(src.splitlines(), start=1):
        if i in drop:
            continue
        line = " ".join(raw.split())
        if not line or len(line) <= 6 or line in ("else:", "try:", "return", "continue", "break", "pass"):
            continue
        numbered.append((i, line))

    rows = []
    for lineno, line in numbered:
        shared = 0
        if ref_budget.get(line, 0) > 0:
            ref_budget[line] -= 1
            shared = 1
        # innermost enclosing function
        best = None
        for s, e, name in spans:
            if s <= lineno <= e and (best is None or s >= best[0]):
                best = (s, e, name)
        fname = best[2] if best else "<module>"
        per_func.setdefault(fname, [0, 0])
        per_func[fname][0] += shared
        per_func[fname][1] += 1

    out = sorted(per_func.items(), key=lambda kv: -kv[1][0])
    total_shared = sum(v[0] for v in per_func.values())
    total = sum(v[1] for v in per_func.values())
    print(f"TOTAL shared {total_shared}/{total} = {total_shared / max(1, total):.2f}")
    for name, (shared, n) in out:
        if shared >= min_shared:
            print(f"{shared:4d}/{n:<4d} {shared / max(1, n):4.2f}  {name}")


if __name__ == "__main__":
    main()
