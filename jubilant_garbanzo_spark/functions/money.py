"""Exact fixed-point aggregation for money-like doubles.

Summing doubles is order-dependent, and both the partial-aggregation
order (Spark) and thread scheduling (DuckDB) vary — so a raw
``sum(double)`` is not reproducible to the last bit, and ``round(sum,2)``
flips at decimal ties. The engine's discipline: scale to an integer unit
(cents / basis points), ``round`` to kill the sub-ULP noise (the true
scaled value is an integer, so there is never a rounding tie), sum
exactly as BIGINT, divide once at the end. Deterministic on any engine,
any partitioning, any cluster size — this is also the right answer at
100 TB, where a 1000-way partial-sum tree would otherwise make results
run-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_fixed(col: Column, decimals: int = 2) -> Column:
    """Scale a money-like double to an exact BIGINT unit."""
    return F.round(col * F.lit(float(10**decimals))).cast("bigint")


def exact_sum(col: Column, decimals: int = 2) -> Column:
    """Exact, order-independent sum of a money-like double column.

    Returns a double with exactly ``decimals`` decimal places.
    """
    return (F.sum(to_fixed(col, decimals)) / F.lit(float(10**decimals))).alias(
        "exact_sum"
    )


def exact_sum_sql(expr: str, decimals: int = 2) -> str:
    """DuckDB twin of :func:`exact_sum` (identical IEEE operation order)."""
    scale = float(10**decimals)
    return (
        f"(CAST(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) AS BIGINT)"
        f" / {scale})"
    )
