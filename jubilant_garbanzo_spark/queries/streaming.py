"""Streaming operators + the flagship trending pipeline (SURVEY.md §2a).

The reference's whole program is one streaming query: filter tweets →
tokenize hashtags → count per sliding 10s/5s window → top-10
(``main.scala:41-55``). Here it exists twice:

- ``trending_topk`` — the *batch twin* on the bounded ``events`` table
  (SURVEY §7 Phase 1 flagship), oracle-checked against DuckDB;
- real Structured Streaming forms in
  :mod:`jubilant_garbanzo_spark.streaming`, run with
  ``trigger(availableNow=True)`` into memory sinks and checked against
  the same batch SQL (SURVEY §5.2.3 streaming equivalence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jubilant_garbanzo_spark.catalog import load_table
from jubilant_garbanzo_spark.queries import register

#: Oracle twin of a Spark sliding window: a record at time t belongs to
#: every window whose start lies in (t - length, t], aligned to the
#: slide. For length=2*slide that is exactly two windows.
_SLIDING_ORACLE = """
    WITH assigned AS (
        SELECT event_type, value,
               make_timestamp((epoch_us(ts) // 5000000) * 5000000) AS w0,
               make_timestamp((epoch_us(ts) // 5000000) * 5000000
                              - 5000000) AS w1
        FROM events
    ), exploded AS (
        SELECT event_type, value, w0 AS window_start FROM assigned
        UNION ALL
        SELECT event_type, value, w1 AS window_start FROM assigned
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS cnt
    FROM exploded
    GROUP BY 1, 2
"""


def sliding_counts(spark, sf_dir):
    """Shared body: event counts per (10s window sliding 5s, event_type).

    Spark's ``window()`` does the window-set assignment natively; the
    oracle replicates it with the two-bucket union above.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 seconds", "5 seconds").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "cnt",
        )
    )


@register(
    "sliding_window_counts",
    oracle=_SLIDING_ORACLE,
    tags=("streaming-twin", "window-agg"),
)
def sliding_window_counts(spark, sf_dir):
    """R5's exact semantics (10s window / 5s slide,
    ``reduceByKeyAndWindow(_+_, Seconds(10))`` at ``main.scala:47``) in
    event time over the bounded events table."""
    return sliding_counts(spark, sf_dir)


@register(
    "trending_topk",
    oracle=f"""
        WITH counts AS ({_SLIDING_ORACLE})
        SELECT window_start, event_type, cnt
        FROM counts
        ORDER BY cnt DESC, window_start ASC, event_type ASC
        LIMIT 10
    """,
    tags=("flagship", "streaming-twin", "topk"),
)
def trending_topk(spark, sf_dir):
    """FLAGSHIP: the reference pipeline R2→R3→R5→R7→R8 as one batch
    query — top-10 busiest (window, event_type) cells, the analog of
    "top-10 trending hashtags of the last 10 seconds" printed by
    ``main.scala:51-55``.

    Scale notes: the groupBy is a partial+final hash aggregate (map-side
    combine before the single shuffle); orderBy+limit compiles to
    ``TakeOrderedAndProject`` — a true distributed top-K, unlike the
    reference's full range-partition sort followed by ``take(10)``
    (``main.scala:49,52``).
    """
    counts = sliding_counts(spark, sf_dir)
    return counts.orderBy(
        F.desc("cnt"), F.asc("window_start"), F.asc("event_type")
    ).limit(10)
