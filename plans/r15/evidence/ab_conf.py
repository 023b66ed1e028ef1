"""Interleaved same-session A/B of runtime SQL confs.
Usage: python /tmp/ab_conf.py --conf k=v [--conf k2=v2] [--pairs N] name...
Variant A = session defaults, variant B = with the confs applied.
"""
from __future__ import annotations

import argparse
import hashlib
import json
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
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    confs = dict(c.split("=", 1) for c in args.conf)

    specs = load_all()
    spark = get_spark("ab-conf")
    baseline = {k: spark.conf.get(k, None) for k in confs}

    def set_b(on: bool):
        for k, v in confs.items():
            if on:
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    set_b(False)
    specs[args.names[0]].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in args.names:
        walls = {"base": [], "conf": []}
        for _ in range(args.pairs):
            for label, on in (("base", False), ("conf", True)):
                set_b(on)
                walls[label].append(round(run_once(spark, specs[name], args.sf), 3))
        set_b(False)
        d0, n0 = digest(spark, specs[name], args.sf)
        set_b(True)
        d1, n1 = digest(spark, specs[name], args.sf)
        set_b(False)
        med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
        out[name] = {
            "base_walls": walls["base"], "conf_walls": walls["conf"],
            "base_med": med["base"], "conf_med": med["conf"],
            "speedup": round(med["base"] / med["conf"], 3) if med["conf"] else None,
            "identical": d0 == d1 and n0 == n1, "rows": n0,
        }
        print(f"# {name}: base {med['base']:.2f}s conf {med['conf']:.2f}s "
              f"speedup {out[name]['speedup']}x identical={out[name]['identical']}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
