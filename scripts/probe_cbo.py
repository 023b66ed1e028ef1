"""CBO table/column-statistics probe (VERDICT r13 #6, SURVEY §4.2).

Question: does Spark's cost-based optimizer — fed real table + column
stats via ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`` —
re-order the join trees of the join-order-sensitive TPC-H heavies
(q5/q9/q21) into something AQE alone doesn't find on this box?

Mechanics: the registry queries read parquet paths directly
(`catalog.load_table`), which bypasses catalog statistics entirely —
CBO can only see stats attached to CATALOG tables. So the probe
builds a one-session catalog database over the SAME parquet files
(``CREATE TABLE ... USING PARQUET LOCATION ...``), ANALYZEs every
table + column, monkeypatches the tpch module's ``load_table`` to
``spark.table(name)``, and flips ``spark.sql.cbo.enabled`` +
``spark.sql.cbo.joinReorder.enabled``. Arms:

- A (baseline): parquet-path scans, CBO off — the shipped plan
  (AQE runtime re-planning stays ON in both arms; it is the engine's
  standing config, and the question is what CBO adds ON TOP).
- B (probe):   catalog scans with full stats, CBO + joinReorder on.

Reps are INTERLEAVED (A,B,A,B,...) per the ambient-load methodology —
this box's external load oscillates, so only like-for-like adjacent
comparisons are meaningful. The join order is extracted from the
formatted plan of each arm so a time delta can be attributed (or not)
to an actual plan change rather than noise.

Usage:
  PYTHONPATH=. python scripts/probe_cbo.py [--sf DIR] [--runs 3]
                                           [--out PROBE_cbo.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jubilant_garbanzo_spark.catalog import TABLES  # noqa: E402
from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402

QUERIES = (
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_profit",
    "tpch_q21_suppliers_kept_waiting",
)

DB = "jg_cbo_probe"


def setup_catalog(spark, sf_dir: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if not os.path.exists(path):
            continue
        spark.sql(f"DROP TABLE IF EXISTS {DB}.{name}")
        spark.sql(
            f"CREATE TABLE {DB}.{name} USING PARQUET LOCATION '{path}'"
        )
        spark.sql(
            f"ANALYZE TABLE {DB}.{name} COMPUTE STATISTICS FOR ALL COLUMNS"
        )


def catalog_load_table(spark, sf_dir: str, name: str):
    # sf_dir ignored: the probe catalog points at the same files.
    return spark.table(f"{DB}.{name}")


def join_order(df) -> list[str]:
    """Leaf scan order from the formatted plan — a join-reorder
    fingerprint that's robust to codegen-id churn."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet[^\[]*\[([a-z_0-9#]+)[,\]]", plan)
    rels = re.findall(r"parquet ([a-z_]+\.[a-z_]+)?", plan)
    out = [r for r in rels if r]
    return out if out else scans


def run_arm(spark, fn, sf_dir: str, cbo: bool) -> float:
    spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/jg_scale/x30")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="PROBE_cbo.json")
    args = ap.parse_args()

    spark = get_spark("probe-cbo")
    specs = load_all()
    setup_catalog(spark, args.sf)

    import jubilant_garbanzo_spark.queries.tpch as tpch_mod

    orig = tpch_mod.load_table
    result: dict = {"sf": args.sf, "runs": args.runs, "queries": {}}
    for qname in QUERIES:
        fn = specs[qname].fn
        # plan fingerprints once per arm
        tpch_mod.load_table = orig
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        plan_a = join_order(fn(spark, args.sf))
        rows_a = fn(spark, args.sf).count()
        tpch_mod.load_table = catalog_load_table
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        plan_b = join_order(fn(spark, args.sf))
        rows_b = fn(spark, args.sf).count()

        walls_a, walls_b = [], []
        for _ in range(args.runs):
            tpch_mod.load_table = orig
            walls_a.append(run_arm(spark, fn, args.sf, cbo=False))
            tpch_mod.load_table = catalog_load_table
            walls_b.append(run_arm(spark, fn, args.sf, cbo=True))
        tpch_mod.load_table = orig
        entry = {
            "baseline_walls": [round(w, 3) for w in walls_a],
            "cbo_walls": [round(w, 3) for w in walls_b],
            "baseline_median": round(sorted(walls_a)[len(walls_a) // 2], 3),
            "cbo_median": round(sorted(walls_b)[len(walls_b) // 2], 3),
            "rows_match": rows_a == rows_b,
            "scan_order_baseline": plan_a,
            "scan_order_cbo": plan_b,
            "plan_changed": plan_a != plan_b,
        }
        result["queries"][qname] = entry
        print(f"# {qname}: base {entry['baseline_median']}s "
              f"cbo {entry['cbo_median']}s plan_changed="
              f"{entry['plan_changed']} rows_match={entry['rows_match']}",
              file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
