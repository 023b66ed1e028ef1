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
#: the window. Round 3: the two round-2 repairs (tpch_q12 BIGINT-cast
#: oracle, array_functions array→string serialization), every query not
#: yet green in CORRECTNESS_r01/r02 (round-2 additions: pipeline
#: composites, remaining streaming, TPC-H q8/q13/q15/q17/q22, rows-only
#: ops), and the queries added this round.
DRIVER_PRIORITY: tuple[str, ...] = (
    # round-2 driver failures, repaired this round
    "tpch_q12_priority_shipping",
    "array_functions",
    # TPC-H additions from round 2, not yet in a driver window
    "tpch_q8_market_share",
    "tpch_q13_order_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    # round-2 pipeline composites
    "dedup_cluster_cc",
    "text_pack_sequences",
    "text_decontamination",
    "embed_ann_lsh",
    "text_pii_scrub",
    "text_robust_scale",
    "join_cogroup_customer_orders",
    "text_normalize_pandas_udf",
    "text_vocab_oov",
    "source_orc",
    # dedup/text oracles upgraded in round 2, never driver-checked
    "dedup_simhash",
    "text_fingerprints",
    "sliding_window_counts",
    # streaming batch-twin oracles
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_join",
    "stream_foreachbatch",
    "stream_watermark_append",
    "stream_parquet_sink",
    # approximate / env-gated ops (rows-only by design)
    "agg_approx_count_distinct",
    "agg_percentile_approx",
    "embed_ann_ivf",
    "multimodal_feature_extract",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills QUERIES).

    Returns the registry with :data:`DRIVER_PRIORITY` names first (in
    that order), then every remaining query in module-import order.
    """
    from jubilant_garbanzo_spark.queries import (  # noqa: F401
        aggregates,
        joins,
        llm,
        pipeline,
        relational,
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
