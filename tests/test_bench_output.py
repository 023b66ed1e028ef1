"""End-to-end guard for bench.py's output contract (VERDICT r6 item 2).

Round 6's driver artifact was lost to stdout-tail truncation: the single
pretty JSON line outgrew the bounded window the driver records, so
``BENCH_r06.json`` parsed as null and 8 headline medians vanished. The
fix is an output ORDER contract — sacrificial noise-band line first,
compact summary (no spaces, ``value`` before ``queries``) as the very
LAST stdout line, full payload mirrored to a file readable whole. A
format contract that only lives in comments regresses silently, so this
runs the real script end-to-end (subprocess, one query, single run,
sf0.001, tmp --out) and pins every piece the driver's parser needs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_stdout_tail_is_compact_parseable_summary(tmp_path):
    out_file = tmp_path / "bench_probe.json"
    # bench_out.json is untracked (commit 3bcf236) — it exists only after
    # a default-path bench run. Snapshot its state so the --out isolation
    # check below works on a fresh checkout too.
    default_artifact = REPO / "bench_out.json"
    before = (
        default_artifact.read_bytes() if default_artifact.exists() else None
    )
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "bench.py"),
            "--sf",
            "/root/testdata/sf0.001",
            "--runs",
            "1",
            "--out",
            str(out_file),
            "trending_topk",
        ],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 2, f"expected >=2 stdout lines, got: {lines!r}"

    # LAST line: the compact summary the driver's bounded tail must catch.
    summary = json.loads(lines[-1])
    assert summary["metric"] == "headline_total_wall"
    assert summary["unit"] == "sec"
    assert isinstance(summary["value"], (int, float))
    assert summary["queries"] == {
        "trending_topk": summary["value"]
    } or set(summary["queries"]) == {"trending_topk"}
    assert summary["method"] == "single-run"
    assert summary["sf"] == 0.001
    # Compactness + field order keep the line small and the total ahead
    # of the per-query dict, so a truncated tail still yields the total.
    assert " " not in lines[-1], "summary line must use compact separators"
    assert lines[-1].index('"value"') < lines[-1].index('"queries"')
    # noise_band is the one dict allowed to be sacrificed to truncation —
    # it must NOT ride on the summary line.
    assert "noise_band" not in summary

    # Second-to-last line: the sacrificial noise-band record.
    bands = json.loads(lines[-2])
    assert bands["metric"] == "noise_band"
    assert set(bands["bands"]) == {"trending_topk"}

    # File mirror: full payload, readable whole, includes the noise band.
    payload = json.loads(out_file.read_text())
    assert payload["value"] == summary["value"]
    assert payload["noise_band"].keys() == payload["queries"].keys()

    # Run-1 wall transparency (VERDICT r15 #7): the cold cost of
    # session-cached index builds must be on the record — per query, on
    # the sacrificial line + file mirror, never on the summary line.
    assert payload["first_run_wall"].keys() == payload["queries"].keys()
    assert "first_run_wall" not in summary
    assert bands["first_run_wall"].keys() == bands["bands"].keys()
    # runs=1 ⇒ the first run IS the median.
    assert payload["first_run_wall"] == payload["queries"]

    # The default artifact must be untouched by an --out run: not created
    # when absent, not rewritten when present.
    after = (
        default_artifact.read_bytes() if default_artifact.exists() else None
    )
    assert after == before, "--out run touched the default bench_out.json"


def test_canary_inflation_math_and_gating():
    """VERDICT r12 #3: the canary-normalization helper must (a) compute
    the median measured/committed ratio over the full canary trio, (b)
    refuse to adjudicate partial runs or off-baseline scale factors —
    a ratio at a different SF measures data volume, not host load."""
    import bench

    ref = bench.CANARY_REF
    # Uniform 1.5x ambient inflation → inflation exactly 1.5.
    timings = {n: v * 1.5 for n, v in ref.items()}
    infl, ratios = bench.canary_inflation(timings, bench.CANARY_REF_SF)
    assert infl == 1.5
    assert set(ratios) == set(ref)
    # Median, not mean: one outlier canary must not drag the estimate.
    skewed = dict(timings)
    first = next(iter(ref))
    skewed[first] = ref[first] * 10.0
    infl_s, _ = bench.canary_inflation(skewed, bench.CANARY_REF_SF)
    assert infl_s == 1.5
    # Partial run (a canary missing) → no adjudication.
    partial = dict(timings)
    del partial[first]
    assert bench.canary_inflation(partial, bench.CANARY_REF_SF) == (None, {})
    # Wrong SF → no adjudication.
    assert bench.canary_inflation(timings, 0.001) == (None, {})


def test_canary_ref_pinned_to_baseline_md():
    """VERDICT r13 #4: bench.CANARY_REF must equal BASELINE.md's LATEST
    committed canary re-sync line — the constants were free-floating
    before this pin, so a baseline re-record that forgot bench.py (or
    vice versa) would silently skew every inflation estimate. The line
    format is fixed: '(trending_topk X s, q1 Y s, q6 Z s)'."""
    import re
    from pathlib import Path

    import bench

    text = (Path(bench.__file__).parent / "BASELINE.md").read_text()
    matches = re.findall(
        r"\(trending_topk ([\d.]+) s, q1 ([\d.]+) s, q6 ([\d.]+) s\)",
        text,
    )
    assert matches, "BASELINE.md lost its committed canary re-sync line"
    t, q1, q6 = (float(v) for v in matches[-1])
    assert bench.CANARY_REF == {
        "trending_topk": t,
        "tpch_q1_pricing_summary": q1,
        "tpch_q6_forecast_revenue": q6,
    }, (
        "bench.CANARY_REF drifted from BASELINE.md's latest committed "
        "canary rows — update both together when re-recording the "
        "baseline"
    )
