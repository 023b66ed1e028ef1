"""Empty-input rescue for ungrouped-aggregate semantics.

ANSI SQL's empty grouping set (``GROUP BY ()``, and the grand-total
set inside CUBE / ROLLUP / GROUPING SETS) emits exactly ONE row over
empty input — the ungrouped aggregate row (count 0, NULL sums). Spark
implements multi-set grouping through ``Expand``, and Expand over zero
input rows yields zero rows, so ``df.cube(...)`` / ``df.rollup(...)``
/ SQL ``GROUPING SETS`` silently drop the standard-mandated grand
total the day an upstream filter yields nothing (round-11 empty-input
audit, BASELINE.md). The same zero-row collapse hits filter-then-join
scalar pipelines (Welch t-test, Platt calibration) whose oracles use
always-one-row scalar subqueries.

:func:`empty_fallback` appends the missing row exactly when the result
is empty, probing EMPTINESS OF THE RESULT rather than re-counting the
input: the probe aggregates the result subtree itself, so the fact
scan/shuffle underneath is byte-identical in both branches and Spark's
ReuseExchange rule serves the probe from the first branch's shuffle —
no second pass over a 100 TB fact table.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def empty_fallback(df: DataFrame, fallback_cols: Iterable[Column]) -> DataFrame:
    """Union ``df`` with a single literal row iff ``df`` is empty.

    ``fallback_cols`` must alias/cast to exactly ``df``'s schema (the
    union is by name). The probe row exists only when ``count(df) == 0``,
    so non-empty results are unchanged.
    """
    probe = (
        df.agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == 0)
        .select(list(fallback_cols))
    )
    return df.unionByName(probe)
