"""The documentation's python examples must actually run.

intro.md and plotting.md execute end-to-end (their blocks share one
namespace per file, like a reader following along); docs whose snippets
reference external resources (chain directories, optional arviz) are
syntax-checked only.
"""

import os
import re
from pathlib import Path

import matplotlib
import pytest

matplotlib.use("Agg")

DOCS = Path(__file__).parent.parent / "docs"

RUNNABLE = ["intro.md", "plotting.md"]
SYNTAX_ONLY = ["fused_pipeline.md", "arviz_integration.md"]


def blocks_of(doc):
    return re.findall(r"```python\n(.*?)```", (DOCS / doc).read_text(), re.S)


@pytest.mark.parametrize("doc", RUNNABLE)
def test_doc_examples_execute(doc, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # examples export figures to cwd
    ns = {}
    for block in blocks_of(doc):
        # the file-loading one-liner needs a real chain dir; everything
        # downstream uses the in-memory construction path instead
        block = "\n".join(
            line for line in block.splitlines() if "loadMCSamples(" not in line or "chains/" not in line
        )
        exec(compile(block, f"{doc} example", "exec"), ns)
    if doc == "plotting.md":
        assert os.path.exists(tmp_path / "figure.pdf")


@pytest.mark.parametrize("doc", SYNTAX_ONLY)
def test_doc_examples_compile(doc):
    for i, block in enumerate(blocks_of(doc)):
        compile(block, f"{doc} example {i}", "exec")
