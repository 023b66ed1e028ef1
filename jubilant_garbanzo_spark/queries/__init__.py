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
#: Round-11 contents: the operators born this round — the early wave
#: (deterministic global corpus shuffle; perceptual-hash image dedup;
#: EXACTSUBSTR duplicated-span removal; unigram-LM / SentencePiece
#: Viterbi tokenizer; hybrid RRF retrieval fusion; CCNet per-segment
#: perplexity bucketing; BPE fertility report; repeat-epochs token
#: budget planner; integer-exact HITS) and the late wave (unigram-LM
#: Viterbi-EM TRAINING; exact-integer PCA power iteration; Gonzalez
#: farthest-point seeding; local clustering coefficient; CUSUM
#: change-point; Spark 4 recursive-CTE reachability, whose body also
#: changed again for the UnionLoop loop-body fix; audio VAD) — plus
#: the suffix-array pair whose round-0 bucket expression changed
#: (ADVICE r10: capped leading-codepoint buckets — results identical,
#: body changed), and the five MinHash-index consumers touched by the
#: recursive _dir_fingerprint fix (same adjudication as the round-10
#: cache-fingerprint change: session-cache keying only, results can't
#: differ, fresh greens anyway per the rotation discipline).
CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round-11 new operators (windowed the round they are born)
    "pipeline_global_shuffle",
    "multimodal_phash_dedup",
    "dedup_exactsubstr_removal",
    "text_unigram_tokenize",
    "retrieval_rrf_fusion",
    "text_ccnet_bucket_filter",
    "text_bpe_fertility",
    "pipeline_token_budget_plan",
    "graph_hits",
    "text_unigram_train",
    "embed_pca_power_iteration",
    "embed_farthest_point_init",
    "graph_clustering_coefficient",
    "timeseries_cusum_changepoint",
    "sql_recursive_cte_reachability",
    "multimodal_audio_vad",
    # suffix-array round-0 bucket cap (ADVICE r10)
    "text_suffix_array",
    "text_longest_dup_substring",
    # recursive dir-fingerprint in the shared index memos (ADVICE r10)
    "dedup_minhash_lsh",
    "dedup_minhash_accuracy",
    "dedup_cluster_cc",
    "dedup_cluster_keep_best",
    "dedup_cluster_incremental",
    # tied-start island-split fix (hypothesis brute-force property
    # found the two window passes using DIFFERENT tie orders; both
    # engines re-ordered identically, so this takes a window slot and
    # tpch_q8_market_share's staleness refresh rolls to round 12)
    "timeseries_interval_coverage",
    # same mismatched-tie-order pattern in the session-numbering pass,
    # found by the follow-up repo-wide window-order audit; takes
    # tpch_q17_small_quantity_revenue's slot (rolls to round 12)
    "join_interval_overlap",
    # verified cross-engine divergences from the quality.py review:
    # strlen (BYTES) vs F.length (CHARS) in the profiler oracle, and
    # the KS statistic's NULL-value ordering (Spark NULLS FIRST vs
    # DuckDB NULLS LAST shifts both CDFs) + tc*tv=0 ANSI crash. They
    # take tpch_q13/q15's slots (roll to round 12).
    "profile_table_stats",
    "profile_ks_two_sample",
)

#: Names promoted to the head of the registry. The driver's correctness
#: check covers the FIRST 50 registry entries per round; queries already
#: proven green in a prior round's CORRECTNESS_r{N}.json don't need the
#: slot again, so each round this list rotates (a) every
#: :data:`CHANGED_THIS_ROUND` query, then (b) the stalest prior greens
#: (``scripts/next_window.py --slots 50`` prints the staleness ranking
#: straight from the committed artifacts), into the window.
#:
#: Round 11 (VERDICT r10 #1): CHANGED_THIS_ROUND + the ENTIRE
#: remaining r2/r3 evidence tail (27 queries — the full tier-4 head of
#: `scripts/next_window.py --slots 50`), then the oldest r4 greens up
#: to the 50-slot cap. After this round's driver pass the oldest
#: driver evidence anywhere in the registry becomes r4.
DRIVER_PRIORITY: tuple[str, ...] = (
    *CHANGED_THIS_ROUND,
    # -- staleness refreshes: last green r2 (the final r2 remainder) -----
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "window_lag_lead",
    "window_range_frame",
    "window_ranking",
    "window_running_frames",
    "window_topn_per_group",
    # -- staleness refreshes: last green r3 (the full r3 cohort) ---------
    "array_functions",
    "join_left_anti",
    "join_left_semi",
    "sliding_window_counts",
    "source_orc",
    "text_decontamination",
    "text_fingerprints",
    "text_normalize_pandas_udf",
    "text_pack_sequences",
    "text_pii_scrub",
    "text_robust_scale",
    "text_vocab_oov",
    "tpch_q12_priority_shipping",
    # tpch_q8_market_share, tpch_q17_small_quantity_revenue,
    # tpch_q13_order_distribution, and tpch_q15_top_supplier (all r3
    # green) evicted by the four correctness fixes this session (two
    # tie-order windows, the profiler strlen/length divergence, the KS
    # NULL-ordering divergence); they roll to round 12 with the twelve
    # r4 agg_* refreshes
    # -- staleness refreshes: last green r4 (oldest-first fill) ----------
    # (agg_collect_list_set / agg_cube / agg_distinct / agg_groupby_basic / agg_grouping_sets / agg_having / agg_percentiles / agg_pivot / agg_rollup /
    # agg_skewness_kurtosis / agg_statistics / agg_unpivot roll to
    # round 12: the late-round stretch operators take their slots,
    # per the pin test's new-query-must-be-windowed invariant; all
    # twelve hold r4 greens, so this is evidence freshness, not
    # correctness)
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
