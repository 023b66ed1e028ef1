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
#: the window. Round 2: the 50 = flagship + TPC-H + windows + relational
#: scalars + setops + sources + remaining text ops + the two repaired agg
#: oracles + the upgraded minhash oracle + two changed streaming queries.
DRIVER_PRIORITY: tuple[str, ...] = (
    "trending_topk",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive",
    "window_ranking",
    "window_lag_lead",
    "window_running_frames",
    "window_range_frame",
    "window_topn_per_group",
    "scan_projection",
    "filter_comparison",
    "filter_in_between_like",
    "filter_null_logic",
    "string_functions",
    "datetime_functions",
    "math_functions",
    "conditional_case",
    "cast_coercion",
    "json_functions",
    "array_functions",
    "map_functions",
    "subquery_correlated_scalar",
    "sort_multikey_nulls",
    "limit_topk",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_except_all",
    "set_intersect_all",
    "scan_csv",
    "scan_json",
    "source_binaryfile",
    "sink_parquet_partitioned",
    "text_train_holdout_split",
    "text_tfidf_top_terms",
    "text_prefix_token_trending",
    "agg_pivot",
    "agg_collect_list_set",
    "dedup_minhash_lsh",
    "stream_session_window",
    "stream_stateful_running_count",
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

    head = {n: QUERIES[n] for n in DRIVER_PRIORITY if n in QUERIES}
    tail = {n: s for n, s in QUERIES.items() if n not in head}
    return {**head, **tail}
