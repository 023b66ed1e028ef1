"""Extract assertable facts from a DataFrame's physical plan.

All parsing works off ``explain("formatted")`` / ``explain("extended")``
text — the same stable surface a user sees — so the helpers hold across
Spark minor versions without touching JVM internals.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: Physical join node names Catalyst can choose (SURVEY §4.2).
JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def formatted_plan(df: DataFrame) -> str:
    """The ``EXPLAIN FORMATTED`` text (physical plan + node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scan (``PushedFilters: [...]``).

    Empty list ⇒ the scan reads every row-group — at 100 TB that is the
    difference between touching one partition and the whole lake.
    """
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (``ReadSchema``) — proves
    column pruning (a 2-column projection must not read 16 columns)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(
            f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()
        )
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join nodes in plan order."""
    plan = formatted_plan(df)
    pat = re.compile("|".join(JOIN_NODES))
    return [m.group(0) for m in pat.finditer(plan)]


def uses_take_ordered(df: DataFrame) -> bool:
    """True when sort+limit fused into ``TakeOrderedAndProject`` — the
    top-K plan that replaces the reference's full sort-then-take
    (``main.scala:49,52``)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when aggregation runs in two phases (map-side partial +
    reduce-side final) so the shuffle carries partial states, not rows."""
    plan = formatted_plan(df)
    return len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)) >= 2


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans; wider spans = fewer virtual
    calls. 0 means everything fell back to interpreted mode.

    Under AQE the final physical plan (with its ``*(n)`` codegen
    markers) only exists after execution, so this helper RUNS the query
    via ``collect()`` (a ``write`` would spawn a separate
    QueryExecution) — intended for plan tests on small inputs only.
    """
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    ids = {m.group(1) for m in re.finditer(r"\*\((\d+)\)", plan)}
    return len(ids)


#: Advisor finding severities.
SEV_WARN = "warn"
SEV_INFO = "info"


def advise(df: DataFrame) -> list[dict]:
    """Static plan review: scan a DataFrame's physical plan for the
    antipatterns that decide 100 TB viability and return findings as
    ``{"severity", "code", "message"}`` dicts (empty list = clean).

    Checks (each mirrors a plan-gate assertion in tests/test_plans.py,
    packaged for ad-hoc use on USER queries):

    - ``cartesian``: CartesianProduct / non-trivial
      BroadcastNestedLoopJoin — per-pair work that cannot scale;
    - ``full-scan``: a parquet scan with NO pushed filters feeding a
      plan that filters afterwards (the filter exists but never
      reached the scan);
    - ``wide-scan``: a scan reading >2× the columns the plan's final
      projection emits (column pruning failed or the query genuinely
      needs the width — worth a look either way);
    - ``single-agg``: an aggregation with no partial phase (every raw
      row crosses the shuffle);
    - ``python-eval``: a row-wise BatchEvalPython node (pickled rows —
      the 10-100× penalty vs Arrow/JVM paths).

    Heuristics over ``explain`` text, deliberately conservative: meant
    to SURFACE candidates for a human/plan-test, not to fail builds on
    its own.
    """
    plan = formatted_plan(df)
    findings: list[dict] = []

    if "CartesianProduct" in plan:
        findings.append(
            {
                "severity": SEV_WARN,
                "code": "cartesian",
                "message": "CartesianProduct in plan — O(|L|·|R|) pair "
                "generation; add an equi-key or broadcast a bounded side",
            }
        )
    bnlj = plan.count("BroadcastNestedLoopJoin")
    if bnlj:
        findings.append(
            {
                "severity": SEV_INFO,
                "code": "nested-loop",
                "message": f"{bnlj} BroadcastNestedLoopJoin node(s) — fine "
                "for 1-row/scalar broadcasts, a scale wall otherwise",
            }
        )
    scans = plan.count("Scan parquet")
    pushed = len(pushed_filters(df))
    if scans and not pushed and re.search(r"\bFilter\b", plan):
        # info, not warn: filters over DERIVED columns (post-aggregate
        # HAVING, sketch thresholds) legitimately cannot push — the
        # finding surfaces the scan for a human look
        findings.append(
            {
                "severity": SEV_INFO,
                "code": "full-scan",
                "message": "plan filters rows but no predicate reached any "
                "parquet scan (PushedFilters empty) — fine for derived-"
                "column filters, a row-group-skipping miss otherwise",
            }
        )
    read_cols = scan_read_schema(df)
    out_cols = len(df.columns)
    if read_cols and out_cols and len(read_cols) > 2 * out_cols + 2:
        findings.append(
            {
                "severity": SEV_INFO,
                "code": "wide-scan",
                "message": f"scans read {len(read_cols)} columns for a "
                f"{out_cols}-column result — check column pruning",
            }
        )
    if re.search(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan):
        if not has_partial_aggregate(df):
            findings.append(
                {
                    "severity": SEV_WARN,
                    "code": "single-agg",
                    "message": "aggregation has no map-side partial phase — "
                    "raw rows cross the shuffle",
                }
            )
    if "BatchEvalPython" in plan:
        findings.append(
            {
                "severity": SEV_WARN,
                "code": "python-eval",
                "message": "BatchEvalPython (row-pickling Python UDF) in "
                "plan — use built-ins or Arrow-batched pandas_udf",
            }
        )
    return findings
