"""Local mirror of the driver's differential-correctness gate.

The driver runs each ``queries()[name]`` PySpark callable and its
``oracle_sql()[name]`` DuckDB twin on identical parquet, then compares
row-count + schema + order-insensitive value hash
(``__spark_entry__.py`` contract). This module reimplements that check
strictly (exact values, type-sensitive) so mismatches are caught in
pytest before the driver ever runs.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from jubilant_garbanzo_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with every driver table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_value(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # STRICT: no tolerance. Queries must produce bit-identical
        # doubles on both engines (exact integer-cents sums, raw IEEE
        # per-row arithmetic, round-to-6 on transcendentals).
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, normalize cells, sort rows — order-insensitive."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return cols, out


def compare_query(
    spark, spec, sf_dir: str, con=None, spark_result=None
) -> list[str]:
    """Run one QuerySpec both ways; return a list of mismatch messages.

    ``spark_result=(columns, rows)`` skips re-executing the Spark side —
    for callers that already collected the frame and want to assert on
    the same rows without paying the heaviest stage twice."""
    problems: list[str] = []
    if spark_result is None:
        sdf = spec.fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
    else:
        s_cols, s_rows = spark_result
        s_rows = [tuple(r) for r in s_rows]

    if spec.oracle is None:
        if not isinstance(s_rows, list):
            problems.append("spark side did not produce rows")
        return problems

    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        res = con.execute(spec.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        if own_con:
            con.close()

    sc, sr = canonical_rows(s_cols, s_rows)
    dc, dr = canonical_rows(d_cols, d_rows)
    if sc != dc:
        problems.append(f"schema mismatch: spark={sc} duckdb={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"row-count mismatch: spark={len(sr)} duckdb={len(dr)}")
        return problems
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            problems.append(
                f"value mismatch at sorted row {i}: spark={a!r} duckdb={b!r}"
            )
            if len(problems) >= 5:
                break
    return problems
