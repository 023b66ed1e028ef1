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
        # ANALYZE ... FOR COLUMNS rejects nested types (the embeddings
        # array) and crashes with a MatchError on TIMESTAMP_NTZ in this
        # Spark build — analyze the supported atomic columns only.
        atomic = [
            f"`{f.name}`"
            for f in spark.table(f"{DB}.{name}").schema.fields
            if f.dataType.typeName()
            not in ("array", "map", "struct", "variant", "timestamp_ntz")
        ]
        if atomic:
            spark.sql(
                f"ANALYZE TABLE {DB}.{name} COMPUTE STATISTICS "
                f"FOR COLUMNS {', '.join(atomic)}"
            )
        else:
            spark.sql(f"ANALYZE TABLE {DB}.{name} COMPUTE STATISTICS")


def catalog_load_table(spark, sf_dir: str, name: str):
    # sf_dir ignored: the probe catalog points at the same files.
    # refreshTable first: the session relation cache otherwise hands
    # EVERY call the same LogicalRelation instance (same attribute
    # ids), which breaks multi-table DAGs and self-joins with
    # MISSING_ATTRIBUTES / ambiguous-self-join errors — path reads
    # never hit this because each read creates fresh attributes.
    # Catalog statistics live in the metastore and survive the refresh.
    spark.catalog.refreshTable(f"{DB}.{name}")
    return spark.table(f"{DB}.{name}")


def join_order(df) -> dict:
    """Join-tree fingerprint from the executed plan: leaf tables in
    scan order (extracted from the parquet locations, which both the
    path-read and catalog arms carry) plus the join-operator sequence.
    Robust to codegen-id churn; a CBO reorder changes one of these."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    leaves = [
        m.rsplit("/", 1)[-1]
        for m in re.findall(r"[\w/.-]+?(?=\.parquet)", plan)
    ]
    # de-noise: keep first occurrence order, drop repeats of the same
    # leaf from multi-line location dumps
    seen, order = set(), []
    for t in leaves:
        if t not in seen:
            seen.add(t)
            order.append(t)
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin)\b[^\n]*?\b"
        r"(Inner|LeftOuter|RightOuter|LeftSemi|LeftAnti|FullOuter|Cross)",
        plan,
    )
    return {"leaf_order": order, "joins": ["/".join(j) for j in joins]}


def run_arm(spark, fn, sf_dir: str, cbo: bool) -> float:
    set_cbo(spark, cbo)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def set_cbo(spark, on: bool) -> None:
    spark.conf.set("spark.sql.cbo.enabled", str(on).lower())
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(on).lower())


def _rows_close(
    res_a: list[tuple], res_b: list[tuple], rel: float = 1e-9
) -> bool:
    """Row-wise compare with exact equality everywhere except floats,
    which get a small relative tolerance (both lists pre-sorted)."""
    for ra, rb in zip(res_a, res_b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if va == vb or (va != va and vb != vb):  # equal or both NaN
                    continue
                if abs(va - vb) > rel * max(abs(va), abs(vb), 1.0):
                    return False
            elif va != vb:
                return False
    return True


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
        # plan fingerprints + full result comparison once per arm
        tpch_mod.load_table = orig
        set_cbo(spark, False)
        plan_a = join_order(fn(spark, args.sf))
        res_a = sorted(map(tuple, fn(spark, args.sf).collect()))
        tpch_mod.load_table = catalog_load_table
        set_cbo(spark, True)
        plan_b = join_order(fn(spark, args.sf))
        res_b = sorted(map(tuple, fn(spark, args.sf).collect()))
        rows_a, rows_b = len(res_a), len(res_b)
        if rows_a != rows_b or not _rows_close(res_a, res_b):
            # Hard abort ONLY on structural mismatch (row counts, keys,
            # beyond-tolerance values). Float columns compare with a
            # small relative tolerance (ADVICE r14): a genuine CBO plan
            # change that reorders floating-point aggregation can move
            # the last ulp — that is the plan change this probe exists
            # to REPORT, not an invalid probe.
            raise SystemExit(
                f"{qname}: CBO arm changed RESULTS, not just the plan — "
                "probe invalid (ambiguous self-join mis-resolution?)"
            )

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
