"""Interleaved same-session A/B of CODE variants: the working tree's
query body (variant "new") vs the body at a given git rev (variant
"old", default HEAD) — the honest measurement for body changes on a
noisy box, mirroring ab_conf.py for confs.

Variant "old" is literally `git show <rev>:<module>` imported under a
temp module name; the registry dict is snapshotted/restored around the
import so the current session's registry is untouched. Both variants
run alternately in ONE JVM (median over N pairs), and the collected
rows of both variants are digest-compared (sorted row-string md5).

Usage:
  python plans/r15/evidence/ab_body.py --module jubilant_garbanzo_spark/queries/graphs.py \
      [--rev HEAD] [--pairs 3] [--sf /root/testdata/sf0.1] [--out x.json] name...
"""
from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from jubilant_garbanzo_spark.queries import QUERIES, load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402


def digest(spark, fn, sf_dir):
    rows = fn(spark, sf_dir).collect()
    canon = sorted(tuple(str(v) for v in r) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()[:12], len(rows)


def run_once(spark, fn, sf_dir):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def load_rev_fns(module_rel: str, rev: str, names: list[str]):
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"{rev}:{module_rel}"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", prefix="ab_old_", delete=False
    ) as f:
        f.write(src)
        tmp = f.name
    snap = dict(QUERIES)
    QUERIES.clear()
    spec = importlib.util.spec_from_file_location("ab_old_module", tmp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # registers OLD fns into QUERIES
    old = {}
    for n in names:
        if n not in QUERIES:
            raise SystemExit(f"{n} not registered by {rev}:{module_rel}")
        old[n] = QUERIES[n].fn
    QUERIES.clear()
    QUERIES.update(snap)
    Path(tmp).unlink()
    return old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--rev", default="HEAD")
    ap.add_argument("--module", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    specs = load_all()
    old_fns = load_rev_fns(args.module, args.rev, args.names)
    new_fns = {n: specs[n].fn for n in args.names}

    spark = get_spark("ab-body")
    # Warm-up (JVM/codegen), excluded.
    specs[args.names[0]].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in args.names:
        walls = {"old": [], "new": []}
        for _ in range(args.pairs):
            walls["old"].append(run_once(spark, old_fns[name], args.sf))
            walls["new"].append(run_once(spark, new_fns[name], args.sf))
        d_old = digest(spark, old_fns[name], args.sf)
        d_new = digest(spark, new_fns[name], args.sf)
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        out[name] = {
            "old_walls": [round(w, 3) for w in walls["old"]],
            "new_walls": [round(w, 3) for w in walls["new"]],
            "old_med": round(med(walls["old"]), 3),
            "new_med": round(med(walls["new"]), 3),
            "speedup": round(med(walls["old"]) / med(walls["new"]), 3),
            "identical": d_old == d_new,
            "rows": d_new[1],
        }
        print(f"# {name}: {out[name]['speedup']}x identical={d_old == d_new}",
              file=sys.stderr)
        if d_old != d_new:
            print(f"!! digest mismatch on {name}: {d_old} vs {d_new}",
                  file=sys.stderr)
    print(json.dumps(out, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
