"""As-of (point-in-time) join — no native Spark operator (SURVEY §2b).

Semantics: for every left row, attach the single right row with the
greatest ``right_ts <= left_ts`` within the same key group (the classic
"latest quote at or before each trade" join).

Implementation — the **union-sort** formulation, not a range join:
tag both inputs, union them, sort within each key by (ts, side), and
carry the most recent right-side values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding frame.

Scale rationale: this costs exactly ONE shuffle (hash partition by
key) + a per-partition sort — the same cost as any keyed window. The
naive alternative (range join then ``row_number() = 1``) materializes
every candidate pair first, which is O(left × right-per-key) and blows
up at 100 TB. Skewed keys are bounded by per-key data volume, not by
pair cardinality, and AQE's skew handling applies to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tie_break: str | None = None,
    how: str = "left",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join ``left`` with ``right`` on key ``on``.

    Returns all ``left`` columns plus ``right_value_cols`` (each taken
    from the latest right row with ``right_ts <= left_ts``; NULL if no
    such row and ``how='left'``). ``tie_break``: a right column that
    resolves equal-``right_ts`` ties deterministically (max wins).
    ``how='inner'`` drops left rows with no match.

    ``direction='forward'`` flips the inequality (EARLIEST right row
    with ``right_ts >= left_ts`` — "next event after"), implemented as
    the same union-sort walk traversed in descending time order.
    ``tolerance_us`` (timestamp columns only) nulls the match when the
    matched right row is further than that many microseconds from the
    left row — pandas ``merge_asof(direction=..., tolerance=...)``
    parity, still one shuffle + one sorted window, never a range join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left.columns
    # Internally always carry the matched right timestamp (for the
    # tolerance distance test); it is emitted only if the caller asked.
    carry_cols = (
        right_value_cols
        if right_ts in right_value_cols
        else [*right_value_cols, right_ts]
    )
    tagged_right_vals = [f"__r_{c}" for c in carry_cols]

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc)
          for c, rc in zip(carry_cols, tagged_right_vals)],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tie_break).cast("long") if tie_break else F.lit(0)).alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(rc) for c, rc in zip(carry_cols, tagged_right_vals)],
    )

    # Right rows sort before left rows at equal __t → "<=" (or ">=" when
    # walking forward) semantics; __tie orders equal-timestamp right
    # rows so `last` is deterministic. Forward = the same walk over
    # descending time: the carried value is then the SMALLEST right_ts
    # that is >= the left row's time.
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__key")
        .orderBy(t_order, F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(rc, ignorenulls=True).over(w).alias(f"__carry_{rc}")
            for rc in tagged_right_vals
        ],
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        lt = F.unix_micros(F.col("__t").cast("timestamp"))
        rt = F.unix_micros(F.col(f"__carry___r_{right_ts}").cast("timestamp"))
        delta = (lt - rt) if direction == "backward" else (rt - lt)
        within = F.col(f"__carry___r_{right_ts}").isNotNull() & (
            delta <= F.lit(tolerance_us)
        )
        for c in carry_cols:
            out = out.withColumn(
                f"__carry___r_{c}", F.when(within, F.col(f"__carry___r_{c}"))
            )
    out = out.select(
        *left_cols,
        *[F.col(f"__carry___r_{c}").alias(c) for c in right_value_cols],
    )
    if how == "inner":
        out = out.filter(F.col(right_value_cols[0]).isNotNull())
    return out
