"""BASELINE.md-vs-bench.py drift guard (VERDICT r5 item 8).

The committed baseline must describe the SAME headline set the driver
benches, or cross-round comparisons silently compare different work.
BASELINE.md carries a canonical '## Headline set' block listing every
benched query in backticks; this test pins that block — membership and
count — to bench.py's HEADLINE tuple, the way test_doc_counts.py pins
the registry counts.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _headline_from_bench() -> tuple[str, ...]:
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def test_baseline_headline_set_matches_bench():
    headline = _headline_from_bench()
    text = (REPO / "BASELINE.md").read_text()
    m = re.search(
        r"## Headline set \((\d+) queries\)\n(.*?)(?:\n## |\Z)",
        text,
        re.DOTALL,
    )
    assert m, "BASELINE.md lost its '## Headline set (<N> queries)' block"
    assert int(m[1]) == len(headline), (
        f"BASELINE.md headline count {m[1]} != bench.py {len(headline)}"
    )
    listed = set(re.findall(r"`([a-z0-9_]+)`", m[2]))
    assert listed == set(headline), (
        f"only in BASELINE.md: {sorted(listed - set(headline))}; "
        f"only in bench.py: {sorted(set(headline) - listed)}"
    )
