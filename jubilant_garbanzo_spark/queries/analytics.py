"""Event-analytics workloads over the ``events`` stream-twin table:
funnel conversion, cohort retention, and gap-filled time series — the
product-analytics query family every OLAP engine ends up serving.

Reference parity note: the reference app (tweet-streamer/src/main/
scala/main.scala, 64 lines) computes only a windowed hashtag count;
these implement the mission's [EXT] analytics surface over the same
event-stream data model.

Timestamp discipline: ``events.ts`` is ns-precision parquet;
``catalog.load_table`` truncates to µs exactly (FIXTURES.md). Event
gaps in this fixture are minutes apart, so µs-vs-ns comparison
granularity cannot reorder any pair of events. Dates leave queries as
DATE (never raw timestamps) per the oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jubilant_garbanzo_spark.catalog import load_table
from jubilant_garbanzo_spark.functions.money import exact_sum, exact_sum_sql
from jubilant_garbanzo_spark.queries import register


@register(
    "funnel_analysis",
    oracle="""
        WITH s AS (
            SELECT user_id, min(ts) AS t_signup
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), v AS (
            SELECT e.user_id, min(e.ts) AS t_view
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'view' AND e.ts > s.t_signup
              AND e.ts <= s.t_signup + INTERVAL 24 HOUR
            GROUP BY e.user_id
        ), c AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
              AND e.ts <= v.t_view + INTERVAL 24 HOUR
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
              AND e.ts <= c.t_click + INTERVAL 72 HOUR
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM s) AS n_signup,
               (SELECT count(*) FROM v) AS n_view_after_signup,
               (SELECT count(*) FROM c) AS n_click_after_view,
               (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
    tags=("analytics", "funnel", "events"),
)
def funnel_analysis(spark, sf_dir):
    """Time-bounded funnel conversion: users who signed up, then viewed
    within 24h of signup, clicked within 24h of that view, purchased
    within 72h of that click — strict order + conversion-window
    semantics (every fixture user eventually emits every event type,
    so an unbounded ordered funnel converts 100% at each stage and
    verifies nothing; the windows make the counts strictly decrease:
    150→39→16→11 at sf0.01).

    Scale shape: each stage is a type-filtered slice of events (the
    filter prunes at the scan) aggregated to one row per user, then
    joined to the previous stage on user_id — every join and agg
    shuffles on the SAME key, so at 100 TB the whole chain reuses one
    hash partitioning (co-partitioned stages, no re-shuffle; AQE
    coalesces the tiny tails). Counts reduce at the driver-side final
    agg only after per-user collapse."""
    ev = load_table(spark, sf_dir, "events")

    def stage(prev, etype: str, prev_ts: str, out_ts: str, window_hours: int):
        e = ev.filter(F.col("event_type") == etype).select(
            "user_id", F.col("ts").alias("ets")
        )
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ets") > F.col(prev_ts))
                & (
                    F.col("ets")
                    <= F.col(prev_ts) + F.expr(f"INTERVAL {window_hours} HOUR")
                )
            )
            .groupBy("user_id")
            .agg(F.min("ets").alias(out_ts))
        )

    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    v = stage(s, "view", "t_signup", "t_view", 24)
    c = stage(v, "click", "t_view", "t_click", 24)
    p = stage(c, "purchase", "t_click", "t_purchase", 72)
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_view_after_signup")))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@register(
    "cohort_retention",
    oracle="""
        WITH first_day AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE))
                   AS day_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN first_day f ON e.user_id = f.user_id
        GROUP BY f.cohort_day,
                 datediff('day', f.cohort_day, CAST(e.ts AS DATE))
    """,
    tags=("analytics", "cohort", "events"),
)
def cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity day,
    counted as active at each day offset — the (cohort × age) grid
    behind every retention curve.

    Scale shape: first-activity is a per-user min (partial agg on
    user_id); the cohort label joins back on user_id (same
    partitioning as the agg); the matrix groupBy is over (date, int)
    keys with count-distinct on user_id — bounded output
    (days × days), partial-agg friendly. At 100 TB the first_day
    table is per-user (small relative to events) and broadcastable."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_day, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "timeseries_gapfill",
    oracle=f"""
        WITH bounds AS (
            SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
            FROM events
        ), spine AS (
            SELECT u.user_id, CAST(gs.d AS DATE) AS day
            FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 3) u
            CROSS JOIN (
                SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
                FROM bounds
            ) gs
        ), actual AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   {exact_sum_sql('value')} AS revenue,
                   count(*) AS n_purchases
            FROM events
            WHERE event_type = 'purchase' AND user_id < 3
            GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT s.user_id, s.day,
               coalesce(a.revenue, 0.0) AS revenue,
               coalesce(a.n_purchases, 0) AS n_purchases
        FROM spine s
        LEFT JOIN actual a ON s.user_id = a.user_id AND s.day = a.day
    """,
    tags=("analytics", "timeseries", "gapfill"),
)
def timeseries_gapfill(spark, sf_dir):
    """Gap-filled daily revenue per user: a generated calendar spine
    (min..max event date) cross-joined with the entity set, left-joined
    with actual daily purchase sums, zeros filled in — the dense
    time series every forecasting/rollup consumer expects (per-user
    purchases are sparse on the 30-day spine, so most cells are
    genuine fills).

    Scale shape: the spine is generated (``sequence`` + explode), never
    scanned — days × entities rows, tiny relative to the fact table;
    the actuals aggregate partial on (user, day); the fill join is
    spine-sized. At 100 TB you'd broadcast the date spine and keep the
    entity dimension partitioned. Revenue uses the exact-cents sum so
    the fill's 0.0 and real sums hash identically cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    users = ev.filter(F.col("user_id") < 3).select("user_id").distinct()
    spine = users.crossJoin(
        bounds.select(
            F.explode(F.sequence("d0", "d1")).alias("day")
        )
    )
    actual = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 3))
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            exact_sum(F.col("value")).alias("revenue"),
            F.count("*").alias("n_purchases"),
        )
    )
    return spine.join(actual, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
    )
