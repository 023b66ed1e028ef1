"""Interleaved same-session A/B: baseline vs early repartition of the
single-row-group input tables (scan fan-out). Usage:
    python /tmp/ab_fanout.py [--sf DIR] [--pairs N] name...
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jubilant_garbanzo_spark.catalog as cat  # noqa: E402
from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402

ORIG_LOAD = cat.load_table

FANOUT_TABLES = {
    "documents", "lineitem", "orders", "events", "embeddings",
    "customer", "part",
}


def fanned_load(spark, sf_dir, name):
    df = ORIG_LOAD(spark, sf_dir, name)
    if name in FANOUT_TABLES:
        n = spark.sparkContext.defaultParallelism
        df = df.repartition(n)
    return df


def patch(on: bool):
    fn = fanned_load if on else ORIG_LOAD
    cat.load_table = fn
    for mod_name, mod in list(sys.modules.items()):
        if mod_name.startswith("jubilant_garbanzo_spark") and mod is not None:
            if getattr(mod, "load_table", None) in (ORIG_LOAD, fanned_load):
                mod.load_table = fn


def run_once(spark, spec, sf_dir):
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def digest(spark, spec, sf_dir):
    rows = spec.fn(spark, sf_dir).collect()
    canon = sorted(tuple(str(v) for v in r) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()[:12], len(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark("ab-fanout")
    # Warm-up
    patch(False)
    specs[args.names[0]].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in args.names:
        walls = {"base": [], "fan": []}
        for _ in range(args.pairs):
            for label, on in (("base", False), ("fan", True)):
                patch(on)
                walls[label].append(round(run_once(spark, specs[name], args.sf), 3))
        patch(False)
        d0, n0 = digest(spark, specs[name], args.sf)
        patch(True)
        d1, n1 = digest(spark, specs[name], args.sf)
        patch(False)
        med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
        out[name] = {
            "base_walls": walls["base"], "fan_walls": walls["fan"],
            "base_med": med["base"], "fan_med": med["fan"],
            "speedup": round(med["base"] / med["fan"], 3) if med["fan"] else None,
            "identical": d0 == d1 and n0 == n1, "rows": n0,
        }
        print(f"# {name}: base {med['base']:.2f}s fan {med['fan']:.2f}s "
              f"speedup {out[name]['speedup']}x identical={out[name]['identical']}",
              file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
