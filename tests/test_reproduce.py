"""tools/reproduce.py — the one-command experiment-suite harness.

Smoke-level CI coverage: the tool must train a model subset end to end
(including the FM->FNN checkpoint handoff it inserts automatically) and
emit a well-formed RESULTS table.  Full-budget runs are manual
(README: ``python tools/reproduce.py --study all`` -> RESULTS.md).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_reproduce_tool_family_table(tmp_path):
    import reproduce

    out = tmp_path / "RESULTS.md"
    reproduce.main([
        "--models", "lr,fnn",          # fnn forces an implicit fm run first
        "--examples", "4000",
        "--epochs", "1",
        "--batch", "256",
        "--out", str(out),
    ])
    text = out.read_text()
    # canonical display order with the implicit fm row present
    assert text.index("| lr |") < text.index("| fm |") < text.index("| fnn |")
    for name in ("lr", "fm", "fnn"):
        row = next(l for l in text.splitlines() if l.startswith(f"| {name} |"))
        auc = float(row.split("|")[2])
        assert 0.0 <= auc <= 1.0
