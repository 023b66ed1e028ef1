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
