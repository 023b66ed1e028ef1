"""Interleaved same-session A/B of an env toggle (read per call).
Usage: python /tmp/ab_env.py --env SPARK_GRAFT_SCAN_FANOUT --a 0 --b 1 name...
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402


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
    ap.add_argument("--env", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark("ab-env")
    os.environ[args.env] = args.a
    specs[args.names[0]].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in args.names:
        walls = {"a": [], "b": []}
        for _ in range(args.pairs):
            for label, val in (("a", args.a), ("b", args.b)):
                os.environ[args.env] = val
                walls[label].append(round(run_once(spark, specs[name], args.sf), 3))
        os.environ[args.env] = args.a
        d0, n0 = digest(spark, specs[name], args.sf)
        os.environ[args.env] = args.b
        d1, n1 = digest(spark, specs[name], args.sf)
        os.environ[args.env] = args.a
        med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
        out[name] = {
            "a_walls": walls["a"], "b_walls": walls["b"],
            "a_med": med["a"], "b_med": med["b"],
            "speedup_b_over_a": round(med["a"] / med["b"], 3) if med["b"] else None,
            "identical": d0 == d1 and n0 == n1, "rows": n0,
        }
        print(f"# {name}: A {med['a']:.2f}s B {med['b']:.2f}s "
              f"speedup {out[name]['speedup_b_over_a']}x identical={out[name]['identical']}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
