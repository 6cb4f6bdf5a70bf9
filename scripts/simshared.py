"""Dump the shared (unordered) lines between a repo module and its reference pair.

Companion to simlines.py: prints each overlapping line with its repo line
numbers so re-derivation can target the actual remaining shared content.

Usage: python scripts/simshared.py getdist_tpu/types.py [min_len]
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

from simcheck import PAIRS
from simlines import REF, REPO, stripped_lines


def main() -> None:
    target = sys.argv[1]
    min_len = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    repo_rel = next(k for k in PAIRS if target in k)
    rp, fp = REPO / repo_rel, REF / PAIRS[repo_rel]
    la, lb = stripped_lines(rp), stripped_lines(fp)
    cb = Counter(lb)
    # map normalized line -> repo line numbers
    src = rp.read_text().splitlines()
    norm2lines: dict[str, list[int]] = {}
    for i, raw in enumerate(src, start=1):
        norm2lines.setdefault(" ".join(raw.split()), []).append(i)
    seen: Counter[str] = Counter()
    shared = []
    for line in la:
        if seen[line] < cb.get(line, 0):
            seen[line] += 1
            if len(line) >= min_len:
                shared.append(line)
    shared.sort(key=len, reverse=True)
    for line in shared:
        nums = norm2lines.get(line, [])[:3]
        print(f"{','.join(map(str, nums)):>12}  {line[:150]}")
    print(f"# {len(shared)} shared lines (of {len(la)}) in {repo_rel}", file=sys.stderr)


if __name__ == "__main__":
    main()
