"""Differential gate: every registered query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS check (row-count + schema +
order-insensitive values, STRICT float equality) at sf0.001 so every
operator addition is verified before commit. Queries without an oracle
get a rows-materialize smoke check.
"""

from __future__ import annotations

import pytest

from jubilant_garbanzo_spark.queries import load_all
from jubilant_garbanzo_spark.testing import compare_query

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = compare_query(spark, SPECS[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems[:3])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["window_start", "event_type", "cnt"]


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries"
