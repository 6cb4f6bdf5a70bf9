"""Show the longest matching token runs between a repo file and its reference
counterpart, with source line numbers, to target re-authoring work.

Usage: python scripts/simblocks.py getdist_tpu/foo.py [ref_name.py] [min_run]
"""

from __future__ import annotations

import io
import sys
import token
import tokenize
from difflib import SequenceMatcher
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/getdist")


def code_tokens(path: Path):
    src = path.read_text()
    toks, lines = [], []
    prev_type = None
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type in (token.COMMENT, token.NL, token.NEWLINE, token.INDENT, token.DEDENT):
                continue
            if tok.type == token.STRING and prev_type in (None, token.NEWLINE, token.NL, token.INDENT, token.DEDENT):
                continue
            if tok.type == token.STRING and len(tok.string) > 80:
                continue
            toks.append(tok.string)
            lines.append(tok.start[0])
            prev_type = tok.type
    except tokenize.TokenError:
        pass
    return toks, lines


def main():
    rel = sys.argv[1]
    ref_name = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].isdigit() else Path(rel).name
    min_run = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 25
    ta, la = code_tokens(REPO / rel)
    tb, lb = code_tokens(REF / ref_name)
    sm = SequenceMatcher(None, ta, tb, autojunk=False)
    blocks = [b for b in sm.get_matching_blocks() if b.size >= min_run]
    blocks.sort(key=lambda b: -b.size)
    total = sum(b.size for b in sm.get_matching_blocks())
    print(f"ratio={2 * total / (len(ta) + len(tb)):.3f}  matched={total}/{len(ta)} repo tokens")
    for b in blocks[:40]:
        print(
            f"  run {b.size:4d} tokens: repo L{la[b.a]}-{la[b.a + b.size - 1]}"
            f"  ~  ref L{lb[b.b]}-{lb[b.b + b.size - 1]}"
        )
        snippet = " ".join(ta[b.a : b.a + min(b.size, 18)])
        print(f"      {snippet[:150]}")


if __name__ == "__main__":
    main()
