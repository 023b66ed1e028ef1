"""Query registry: one named entry per SURVEY.md §2 operator.

Each query is a pair:

- a PySpark callable ``(spark, sf_dir) -> DataFrame`` (the engine path),
- optionally a DuckDB-runnable ANSI-SQL string (the oracle path).

The driver (``__spark_entry__.py``) runs both at sf0.01 and compares
row-count + schema + order-insensitive value hash. Discipline enforced
here (SURVEY.md §7 "hard parts"):

- alias EVERY computed column identically on both sides;
- round floating-point aggregates (ROUND_* constants);
- any LIMIT query is totally ordered (unique tie-break keys) so both
  engines pick the same rows;
- timestamps leave queries as formatted strings or DATEs, never raw
  timestamps, to sidestep tz/precision representation drift.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: Global registry, populated at import time by the query modules.
QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


#: Names promoted to the head of the registry. The driver's correctness
#: check covers the FIRST 50 registry entries per round; queries already
#: proven green in a prior round's CORRECTNESS_r{N}.json don't need the
#: slot again, so each round this list rotates the not-yet-driver-verified
#: queries (plus any whose implementation/oracle changed this round) into
#: the window. Round 6, exactly 50 entries, three tiers:
#:
#: 1. Never driver-checked (drains the round-5 window spillover and adds
#:    the six new derived-partsupp TPC-H queries) — restores the
#:    every-query-has-a-driver-green-row invariant.
#: 2. Changed this round: adaptive LSH band geometry
#:    (embed_similarity_join / dedup_embedding_cosine / embed_ann_lsh),
#:    string-serialized outputs (text_inverted_index — the r5 driver
#:    ERR — and embed_label_centroids, tier 1), the scd2 event_id
#:    tiebreak, the newly-oracled multimodal_feature_extract, and the
#:    foreachBatch distributed-merge refactor (stream_foreachbatch,
#:    stream_countmin_topk in tier 1); stream_parquet_sink rides along
#:    per the r5 adjudication.
#: 3. Round-6 waves 3–4 (27 brand-new queries — never driver-checked,
#:    so they outrank stale-evidence refreshes). Six late wave-4
#:    queries did not fit the 50-slot window and queue for round 7
#:    with local-strict-gate greens (several also checked at sf0.1):
#:    text_zipf_slope, json_variant_type, agg_filter_clause,
#:    string_collation_ci, conditional_try_functions,
#:    join_lateral_topn, text_bigram_avg_nll, dedup_minhash_accuracy,
#:    stream_session_ttl. Wave-5 (post-window additions, all strict-gate
#:    green at sf0.01 this session) queues with them: agg_welch_ttest,
#:    profile_ks_two_sample, event_attribution_last_touch,
#:    timeseries_linear_interpolate, graph_degree_distribution,
#:    dedup_semantic_clusters, event_cumulative_reach, join_range_lookup,
#:    event_activity_streaks, event_rfm_segmentation, sql_pipe_syntax,
#:    sql_udf_scalar, sql_parameterized, stream_attribution_last_touch,
#:    timeseries_holt_linear, agg_gini_concentration, table_time_travel,
#:    quality_iqr_fences, event_spike_detection, agg_mutual_information,
#:    graph_kcore, text_winnowing_fingerprints, dedup_winnowing_overlap,
#:    pipeline_temperature_mixture, graph_link_prediction_jaccard,
#:    timeseries_seasonal_decompose, scd2_apply_changes, agg_cramers_v,
#:    window_rolling_distinct_users, event_path_trigrams, agg_pareto_share.
#: 4. `join_asof` — its operator body (operators/asof.py) changed this
#:    round, so the rotation discipline requires a fresh green. The
#:    stale-evidence refreshes it displaced are enumerated below and
#:    queue for round 7 — all are green in the local strict gate and
#:    carry older driver greens, so no query is evidence-free.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- tier 1: never driver-checked (queued from round 5) --------------
    "table_diff_snapshots",
    "embed_label_centroids",
    "pipeline_end_to_end",
    "stream_countmin_topk",
    "stream_session_dynamic_gap",
    "agg_mode_deterministic",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relation",
    "tpch_q20_potential_promotion",
    "tpch_q21_suppliers_kept_waiting",
    # -- tier 2: changed in round 6 --------------------------------------
    "text_inverted_index",
    "embed_similarity_join",
    "dedup_embedding_cosine",
    "embed_ann_lsh",
    "scd2_from_events",
    "multimodal_feature_extract",
    "stream_foreachbatch",
    "stream_parquet_sink",
    # round-6 wave 2 (new queries)
    "timeseries_ewma",
    "pandas_scalar_iter_seam",
    "join_null_safe",
    "set_union_missing_columns",
    # -- tier 3: round-6 wave 3 (new queries + changed asof operator) ----
    "join_bloom_prefilter",
    "timeseries_interval_coverage",
    "assoc_copurchase_lift",
    "ids_global_row_number",
    "embed_kmeans_lloyd",
    "validate_table_checksum",
    "stream_chained_agg",
    "join_point_in_time_scd2",
    "agg_exact_median_histogram",
    "graph_label_propagation",
    "profile_psi_drift",
    "join_asof_forward_tolerance",
    # round-6 wave 4 (new queries; displaced five more tier-4 refreshes)
    "agg_incremental_maintenance",
    "agg_hll_intersection",
    "pipeline_shard_binpack",
    "validate_order_totals",
    "sink_python_datasource_writer",
    "stream_python_datasource_sink",
    "agg_bitmap_exact_distinct",
    "text_langid_eval",
    "sample_bootstrap_means",
    "timeseries_backtest_seasonal_naive",
    "graph_sssp_bellman_ford",
    "quality_benford_digits",
    "window_time_range_frame",
    # -- tier 4: join_asof stays because its operator body changed this
    #    round. Every other refresh slot yielded to round-6 new queries:
    #    the displaced round-1/2-vintage rows (join_cross,
    #    join_theta_range, join_self_pairs, join_broadcast_star,
    #    join_bucketed_colocated, join_salted_skew, dedup_exact,
    #    dedup_exact_by_fingerprint, text_stats, text_lang_filter,
    #    text_lang_id, text_quality_score, text_token_count_regex,
    #    text_term_frequency, embed_norms, multimodal_binary_meta,
    #    multimodal_frame_sample, text_chunking, trending_topk,
    #    window_*, scan_projection) all carry older driver greens AND
    #    current local-strict-gate greens; they queue for round 7.
    "join_asof",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills QUERIES).

    Returns the registry with :data:`DRIVER_PRIORITY` names first (in
    that order), then every remaining query in module-import order.
    """
    from jubilant_garbanzo_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        graphs,
        joins,
        llm,
        pipeline,
        quality,
        relational,
        retrieval,
        setops,
        sources,
        streaming,
        tpch,
        windows,
    )

    unknown = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    if unknown:
        # A typo here would silently drop the query from the driver's
        # 50-entry verification window — the exact failure the rotation
        # exists to prevent. Fail loudly instead.
        raise KeyError(f"DRIVER_PRIORITY names not in registry: {unknown}")
    head = {n: QUERIES[n] for n in DRIVER_PRIORITY}
    tail = {n: s for n, s in QUERIES.items() if n not in head}
    return {**head, **tail}
