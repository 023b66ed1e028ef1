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


#: Queries whose bodies/oracles changed (or were born) this round, or
#: whose latest body has never had a driver row. The rotation
#: discipline (VERDICT r4/r7): a changed query needs a fresh driver
#: green even if an old row exists. This tuple is ENFORCED as the head
#: prefix of :data:`DRIVER_PRIORITY` by
#: tests/test_doc_counts.py::test_changed_this_round_leads_window —
#: ADVICE r8's fix for the round-8 failure where a promised rotation
#: silently never happened.
#:
#: Round-14 contents (the second rotation round, VERDICT r13): the four
#: ADVICE-r13 body fixes. Three are crash-vs-NULL parity repairs — the
#: round-13 div-zero sweep guarded only the ORACLE half of
#: text_zipf_slope and text_quality_calibration (ANSI-default Spark 4
#: throws DIVIDE_BY_ZERO where the oracle's CASE yields NULL); both
#: Spark sides now carry F.try_divide, and event_spike_detection's z
#: expression was hardened the same way (its safety on warm-up rows
#: relied on filter-conjunct short-circuit ordering). The fourth is
#: graph_pagerank: the dangling-set broadcast hint is now conditioned
#: on the graph_partitions small-graph signal so an unhinted large
#: graph lets AQE pick the join strategy (the dangling set is
#: O(|nodes|) — force-broadcasting it hard-coded a small-graph
#: assumption into a general operator).
CHANGED_THIS_ROUND: tuple[str, ...] = (
    "text_zipf_slope",  # Spark-side try_divide on the singular fit
    "text_quality_calibration",  # try_divide on the singular 2x2 solve
    "event_spike_detection",  # try_divide z; no conjunct-order reliance
    "graph_pagerank",  # dangling broadcast gated on graph_partitions
    # the x100 perf lever: runtime-proven packed-key BIGINT pair agg
    # (identical integers; see BASELINE.md round-14 lever entry)
    "text_sparse_tfidf_cosine",
    # the audit_divzero '%'-extension find: the derived partsupp's
    # shared _PS_SUPPKEY constants gained the zero-supplier CASE +
    # greatest floor on BOTH engines (q11/q16/q20 were also r6-stale)
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relation",
    "tpch_q20_potential_promotion",
)

#: Names promoted to the head of the registry. The driver's correctness
#: check covers the FIRST 50 registry entries per round; queries already
#: proven green in a prior round's CORRECTNESS_r{N}.json don't need the
#: slot again, so each round this list rotates (a) every
#: :data:`CHANGED_THIS_ROUND` query, then (b) the stalest prior greens
#: (``scripts/next_window.py --slots 50`` prints the staleness ranking
#: straight from the committed artifacts), into the window.
#:
#: Round 14 (the second rotation round, VERDICT r13 #1): the 10
#: CHANGED bodies + the ENTIRE remaining r5-green block (28 queries) +
#: the 12 oldest r6-greens fill the 50 slots exactly
#: (``scripts/next_window.py --slots 50`` printed this ranking from the
#: committed CORRECTNESS_r01–r13 artifacts). After this round the
#: staleness floor moves to r6-era, and every ADVICE-r13 body fix —
#: plus the round's perf-lever body (sparse-tfidf packed-key agg) and
#: the five partsupp zero-supplier-guard consumers — carries a fresh
#: driver row.
DRIVER_PRIORITY: tuple[str, ...] = (
    *CHANGED_THIS_ROUND,
    # -- staleness refreshes: the full remaining r5-green block ---------
    "agg_approx_count_distinct",
    "agg_hll_sketch_union",
    "agg_percentile_approx",
    "embed_ann_ivf",
    "embed_knn_join",
    "event_markov_transitions",
    "event_pattern_match",
    "graph_bfs_hops",
    "graph_triangle_count",
    "sink_zorder_parquet",
    "source_mergeschema",
    "stream_dedup",
    "stream_dedup_within_watermark",
    "stream_session_window",
    "stream_sliding_window",
    "stream_stateful_running_count",
    "stream_static_join",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_tumbling_window",
    "stream_watermark_append",
    "subquery_in_uncorrelated",
    "subquery_not_in_null",
    "text_bigram_pmi",
    "text_bm25_rank",
    "text_chi2_terms",
    "text_unigram_logprob",
    "timeseries_time_weighted_avg",
    # -- staleness refreshes: the 12 oldest r6-greens --------------------
    "agg_bitmap_exact_distinct",
    "agg_exact_median_histogram",
    "agg_incremental_maintenance",
    "agg_mode_deterministic",
    "assoc_copurchase_lift",
    "embed_kmeans_lloyd",
    "embed_label_centroids",
    "ids_global_row_number",
    "join_asof",
    "join_asof_forward_tolerance",
    "join_null_safe",
    "join_point_in_time_scd2",
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
