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
#: Round-9 contents: the 12 queries whose round-7 bodies were never
#: driver-checked (the r8 window burned its slots re-verifying the
#: unchanged r7 window) — the pickle-by-value serialization set (two
#: pandas seams, five multimodal, three Python-DataSource), the
#: build-once-checkpoint `dedup_minhash_lsh`, and the flagship
#: `trending_topk` — plus everything round 9 itself adds or touches.
CHANGED_THIS_ROUND: tuple[str, ...] = (
    # r7 serialization hardening, never driver-checked (VERDICT r8 #1)
    "pandas_grouped_agg_seam",
    "pandas_scalar_iter_seam",
    "multimodal_binary_meta",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "source_python_datasource",
    "sink_python_datasource_writer",
    "stream_python_datasource_sink",
    # r7 build-once-checkpoint body, displaced from the r7 window
    "dedup_minhash_lsh",
    # flagship — rotates back per the r7 adjudication comment
    "trending_topk",
    # round-9 new operators (windowed the round they are born)
    "text_bpe_tokenize",
    "text_bpe_pack",
    "text_quality_classifier",
    "text_url_canonical_dedup",
    "stream_stream_full_outer",
    # round-9 shared minhash_index build (VERDICT r7 #6): both bodies
    # now consume the session-memoized index; dedup_minhash_lsh (also
    # rerouted) already holds a head slot above.
    "dedup_minhash_accuracy",
    "dedup_cluster_cc",
    # round-9 wave 2: the tokenizer TRAINING half + the full IVFADC
    # residual search
    "text_bpe_train",
    "embed_ann_ivfpq",
    "text_quality_calibration",
    "text_sparse_tfidf_cosine",
    "text_heaps_law",
    "sink_hilbert_parquet",
    "stream_kmv_bottomk",
)

#: Names promoted to the head of the registry. The driver's correctness
#: check covers the FIRST 50 registry entries per round; queries already
#: proven green in a prior round's CORRECTNESS_r{N}.json don't need the
#: slot again, so each round this list rotates (a) every
#: :data:`CHANGED_THIS_ROUND` query, then (b) the stalest prior greens
#: (``scripts/next_window.py --slots 50`` prints the staleness ranking
#: straight from the committed artifacts), into the window.
#:
#: Round 9: the never-driver-checked queue is EMPTY (r7 drained it;
#: union of CORRECTNESS_r01–r08 covers all 257 prior queries), so the
#: window is CHANGED_THIS_ROUND + the oldest greens — the r1 cohort
#: (last green round 1) and the front of the r2 cohort.
DRIVER_PRIORITY: tuple[str, ...] = (
    *CHANGED_THIS_ROUND,
    # -- staleness refreshes: last green r1 --------------------------------
    "dedup_exact",
    "dedup_exact_by_fingerprint",
    "embed_norms",
    "join_broadcast_star",
    "join_bucketed_colocated",
    "join_cross",
    "join_salted_skew",
    "join_self_pairs",
    "join_theta_range",
    "text_chunking",
    "text_lang_filter",
    "text_lang_id",
    "text_quality_score",
    "text_stats",
    "text_term_frequency",
    "text_token_count_regex",
    # -- staleness refreshes: last green r2 --------------------------------
    "cast_coercion",
    "conditional_case",
    "datetime_functions",
    "filter_comparison",
    "filter_in_between_like",
    "filter_null_logic",
    "json_functions",
    "limit_topk",
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
