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
#: Round-13 contents (the evidence-freshness round, VERDICT r12):
#:
#: (a) the 17 round-12 refactor-tier queries — their bodies changed in
#: round 12 (md5-helper extraction + shared sessionizer/contingency
#: grid) but they were adjudicated OUT of the r12 window on
#: refactor-purity grounds; VERDICT r12 ruled that a one-time bend and
#: requires them to lead this window ("changed body ⇒ fresh driver
#: green");
#:
#: (b) the queries whose bodies/oracles changed THIS round: the
#: PageRank dangling-set hoist, the two hashed-posting PPJoin
#: candidate stages, the three div-zero oracle guards (skewness is
#: listed once — it is also r4-stale), the two DECIMAL-product
#: overflow fixes from the new extremes audit (welch also takes its
#: oracle's HUGEINT twin), and source_binaryfile whose blob-export
#: fixture path was re-versioned (ADVICE r12).
CHANGED_THIS_ROUND: tuple[str, ...] = (
    # -- (a) the round-12 refactor tier: md5-hash helper consumers ----
    "text_fingerprints",
    "text_quality_classifier",
    "text_dsir_resample",
    "dedup_simhash",
    "sample_stratified_hash",
    "text_winnowing_fingerprints",
    "dedup_winnowing_overlap",
    "agg_countmin_heavy_hitters",
    "stream_countmin_topk",
    "stream_kmv_bottomk",
    "join_bloom_prefilter",
    "pipeline_shard_binpack",
    "pipeline_global_shuffle",
    "validate_table_checksum",
    # -- (a) the round-12 shared-sessionizer/contingency-grid tier ----
    "sessionize_events",
    "join_interval_overlap",
    "agg_mutual_information",
    # -- (b) round-13 body changes ------------------------------------
    "graph_pagerank",  # static dangling set + fused scalar broadcast
    "dedup_ngram_jaccard",  # xxhash64-encoded postings + collision guard
    "dedup_shingle_containment",  # same hashed-posting upgrade
    # -- (b) round-13 oracle guards (div-zero sweep) -------------------
    "agg_skewness_kurtosis",  # zero-variance CASE (also r4-stale)
    "text_zipf_slope",  # singular-fit CASE
    "text_quality_calibration",  # singular 2x2 IRLS CASE
    # -- (b) round-13 extremes-audit overflow fixes --------------------
    "agg_welch_ttest",  # DECIMAL cents² product (both engines)
    "agg_regression_exact_moments",  # DECIMAL/HUGEINT moment products
    # -- (b) blob-export fixture path re-versioned (ADVICE r12) --------
    "source_binaryfile",
)

#: Names promoted to the head of the registry. The driver's correctness
#: check covers the FIRST 50 registry entries per round; queries already
#: proven green in a prior round's CORRECTNESS_r{N}.json don't need the
#: slot again, so each round this list rotates (a) every
#: :data:`CHANGED_THIS_ROUND` query, then (b) the stalest prior greens
#: (``scripts/next_window.py --slots 50`` prints the staleness ranking
#: straight from the committed artifacts), into the window.
#:
#: Round 13: the 26 CHANGED queries (17 refactor-tier + 9 this-round
#: bodies/oracles) + the ENTIRE remaining r4-staleness block (24
#: queries — agg_skewness_kurtosis, sample_stratified_hash, and
#: sessionize_events are already CHANGED) fill the 50 slots exactly,
#: clearing BOTH items the r12 verdict set for this window: after this
#: round every query's newest driver evidence is r5-era or newer and
#: no changed body lacks a driver row.
DRIVER_PRIORITY: tuple[str, ...] = (
    *CHANGED_THIS_ROUND,
    # -- staleness refreshes: the full remaining r4-green block ---------
    "agg_pivot",
    "agg_unpivot",
    "cohort_retention",
    "embed_cosine_topk",
    "embed_pq_encode",
    "embed_quantize_int8",
    "funnel_analysis",
    "fuzzy_name_match",
    "join_full_outer",
    "join_inner",
    "join_left_outer",
    "join_right_outer",
    "lateral_explode_tokens",
    "profile_key_skew",
    "profile_length_histogram",
    "quality_repetition_filter",
    "sample_reservoir_per_group",
    "sink_clustered_parquet",
    "source_xml",
    "text_domain_mixture",
    "timeseries_downsample_ohlc",
    "timeseries_gapfill",
    "tpch_q22_global_sales_opportunity",
    "upsert_latest_by_key",
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
