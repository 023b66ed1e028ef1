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
#: Round-10 contents: the thirteen operators born this round (Gopher
#: battery, DSIR resampling, BPE train→apply roundtrip, cluster
#: retention, incremental cluster maintenance, n-gram novelty,
#: suffix array, longest-dup-substring, T5 span corruption,
#: Kneser-Ney NLL, streaming first-seen registry, GROUP BY ALL +
#: lateral-alias SQL surface, Matryoshka truncation recall),
#: every query whose ORACLE was rewritten for the closing-gate cost
#: fix (posting-join pair forms, vocabulary-bound BPE replay,
#: MATERIALIZED LPA/SSSP rounds), the cogroup engine-side pushdown,
#: and every query the ADVICE-r9 fixes touched (short-doc shingle
#: guard, BPE oracle wid stride, canonicalize_url NULL fallback,
#: minhash_index cache-key fingerprint).
CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round-10 new operators (windowed the round they are born)
    "text_gopher_rules",
    "text_dsir_resample",
    "text_bpe_roundtrip",
    "dedup_cluster_keep_best",
    "text_ngram_novelty",
    "text_suffix_array",
    "text_longest_dup_substring",
    "dedup_cluster_incremental",
    "text_span_corruption",
    "text_kneser_ney_nll",
    "stream_novelty_registry",
    "sql_group_by_all_lateral_alias",
    "embed_matryoshka_recall",
    # round-10 closing-gate oracle rewrites (posting-join forms /
    # MATERIALIZED round CTEs): the compare changed, so each needs a
    # fresh driver green
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "graph_label_propagation",
    "graph_sssp_bellman_ford",
    # round-10 engine fix: orders-side filter mirrored through the
    # opaque cogroup seam (155 s -> 7 s at sf0.1)
    "join_cogroup_customer_orders",
    # ADVICE r9 medium: sequence(1,0) shingle guard in both bodies
    "text_sparse_tfidf_cosine",
    "text_heaps_law",
    # ADVICE r9: canonicalize_url NULL fallback (body + oracle twin)
    "text_url_canonical_dedup",
    # ADVICE r9: BPE oracle word-id stride 1024 → 2^20
    "text_bpe_tokenize",
    "text_bpe_pack",
    # ADVICE r9: minhash_index memo now fingerprints the input dir
    "dedup_minhash_lsh",
    "dedup_minhash_accuracy",
    "dedup_cluster_cc",
)

#: Names promoted to the head of the registry. The driver's correctness
#: check covers the FIRST 50 registry entries per round; queries already
#: proven green in a prior round's CORRECTNESS_r{N}.json don't need the
#: slot again, so each round this list rotates (a) every
#: :data:`CHANGED_THIS_ROUND` query, then (b) the stalest prior greens
#: (``scripts/next_window.py --slots 50`` prints the staleness ranking
#: straight from the committed artifacts), into the window.
#:
#: Round 10 (VERDICT r9 #1): CHANGED_THIS_ROUND (26: the 13 queries
#: born this round + 13 whose bodies/oracles changed) + the 24 stalest
#: greens, per `scripts/next_window.py --slots 50`. That covers 24 of
#: the 34-query r2 cohort; the remaining 10 r2-stale entries
#: (tpch_q3-q7 and the five window_* queries) did NOT fit after the
#: round's changed set grew — they are the head of round 11's
#: staleness queue, ahead of the r3 cohort.
DRIVER_PRIORITY: tuple[str, ...] = (
    *CHANGED_THIS_ROUND,
    # -- staleness refreshes: last green r2 (the full remaining cohort) ----
    "map_functions",
    "math_functions",
    "scan_csv",
    "scan_json",
    "scan_projection",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union_all",
    "set_union_distinct",
    "sink_parquet_partitioned",
    "sort_multikey_nulls",
    "source_binaryfile",
    "string_functions",
    "subquery_correlated_scalar",
    "text_prefix_token_trending",
    "text_tfidf_top_terms",
    "text_train_holdout_split",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive",
    "tpch_q1_pricing_summary",
    # -- staleness refreshes: last green r3 (none left this round —
    # the round-10 wave-2 operators and the oracle rewrites take the
    # remaining slots, per the rotation discipline above; the r3
    # cohort, tpch_q3-q7 and the window_* family (lag_lead,
    # range_frame, ranking, running_frames, topn_per_group) roll to
    # round 11) ---------------------------------------------------------
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
