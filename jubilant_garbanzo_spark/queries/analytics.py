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


@register(
    "sessionize_events",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, ts, event_id, value,
                   epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_us
            FROM events
        ), flagged AS (
            SELECT *, CASE WHEN prev_us IS NULL
                             OR us - prev_us > 1800000000
                           THEN 1 ELSE 0 END AS is_new
            FROM ordered
        ), numbered AS (
            SELECT *, CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               count(*) AS n_events,
               max(us) - min(us) AS duration_us,
               {exact_sum_sql('value')} AS total_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
    tags=("analytics", "sessionize", "events", "window"),
)
def sessionize_events(spark, sf_dir):
    """Batch sessionization: per-user event streams split into sessions
    at >30 min inactivity gaps (lag + gap flag + running sum — the
    canonical batch twin of ``stream_session_window``'s state-store
    sessionizer; reference parity: the reference's only notion of
    "session" is its 10 s hashtag window, main.scala:47).

    The gap test runs on exact integer µs (``unix_micros``), never
    float seconds, so the session boundary is bit-deterministic
    cross-engine; ties inside a user are broken by event_id.

    Scale shape: ONE shuffle on user_id serves both window functions
    and the final per-session agg (same partitioning reused across all
    three stages); per-user partitions sort locally. At 100 TB,
    sessionization is the textbook "window over hot entity" op — a
    celebrity user with 10^8 events skews a partition, and the fix is
    range-partitioning within user by day with session stitching at
    day boundaries; at fixture scale (and for any human-generated
    event stream) per-user volumes are bounded and the plain window
    is the right plan."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        # NTZ→TS cast is wall-clock identity under the UTC session tz,
        # so this epoch equals DuckDB's epoch_us over the naive ts.
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        exact_sum(F.col("value")).alias("total_value"),
    )


@register(
    "timeseries_downsample_ohlc",
    oracle=f"""
        WITH keyed AS (
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M')
                       AS bucket,
                   value,
                   lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                   lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
            FROM events
        )
        SELECT event_type, bucket,
               arg_min(value, ord) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value, ord) AS close,
               count(*) AS n_events,
               {exact_sum_sql('value')} AS total_value
        FROM keyed
        GROUP BY event_type, bucket
    """,
    tags=("analytics", "timeseries", "downsample", "ohlc"),
)
def timeseries_downsample_ohlc(spark, sf_dir):
    """OHLC downsampling: per (event_type, hour) bucket — open (first
    value), high, low, close (last value), volume, exact total — the
    hypertable-rollup / candlestick query of every time-series store.

    First/last are ``min_by``/``max_by`` over a DETERMINISTIC string
    order key (zero-padded µs epoch + event_id): timestamp ties cannot
    make the two engines pick different rows, and the selected values
    are untouched doubles (no arithmetic), so they hash bit-for-bit.

    Scale shape: pure partial aggregation — min_by/max_by/min/max/
    count/sum all combine map-side, so the shuffle carries one row per
    (type × hour) regardless of input size; the downsample output is
    bounded by the time range, not the event volume. This is the
    continuous-aggregate pattern: at 100 TB you'd maintain it
    incrementally per arriving partition and merge, which is exactly
    what the partial-agg decomposition gives for free."""
    ev = load_table(spark, sf_dir, "events")
    ord_key = F.concat(
        F.lpad(
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
            20,
            "0",
        ),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    return (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm")
            .alias("bucket"),
            "value",
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord").alias("close"),
            F.count("*").alias("n_events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
    )
