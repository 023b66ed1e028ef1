"""Session-level interleaved A/B for STATIC Spark confs (e.g.
spark.io.compression.codec) that cannot be flipped at runtime.

Alternates fresh subprocess sessions A,B,A,B,... (same query list per
session, wall per query measured inside the session after one warm-up),
reports per-variant medians. Noisier than the in-JVM A/B — use only for
static confs, and trust direction over magnitude.

Usage: python ab_static_conf.py --conf k=v [--rounds 3] name...
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from jubilant_garbanzo_spark.queries import load_all
from jubilant_garbanzo_spark.session import get_spark
names = json.loads(sys.argv[1])
sf = sys.argv[2]
specs = load_all()
spark = get_spark("ab-static")
specs[names[0]].fn(spark, sf).write.format("noop").mode("overwrite").save()
out = {}
for n in names:
    t0 = time.perf_counter()
    specs[n].fn(spark, sf).write.format("noop").mode("overwrite").save()
    out[n] = round(time.perf_counter() - t0, 3)
print("RESULT " + json.dumps(out))
"""


def run_session(confs: dict, names, sf, extra_env=None):
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    # get_spark only sets RUNTIME_CONF; static confs ride the
    # spark-submit pre-session channel.
    env["PYSPARK_SUBMIT_ARGS"] = (
        " ".join(f"--conf {k}={v}" for k, v in confs.items())
        + " pyspark-shell"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER)
        path = f.name
    p = subprocess.run(
        [sys.executable, path, json.dumps(list(names)), sf],
        capture_output=True,
        text=True,
        env=env,
    )
    os.unlink(path)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise SystemExit(f"worker failed:\n{p.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--env", action="append", default=[], help="k=v: set only in the CONF variant; base runs without it")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    confs = dict(c.split("=", 1) for c in args.conf)
    envs = dict(c.split("=", 1) for c in args.env)

    runs = {"base": [], "conf": []}
    for r in range(args.rounds):
        runs["base"].append(run_session({}, args.names, args.sf))
        runs["conf"].append(run_session(confs, args.names, args.sf, envs))
        print(f"# round {r} done", file=sys.stderr)

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {}
    for n in args.names:
        b = med([run[n] for run in runs["base"]])
        c = med([run[n] for run in runs["conf"]])
        out[n] = {
            "base_walls": [run[n] for run in runs["base"]],
            "conf_walls": [run[n] for run in runs["conf"]],
            "base_med": b,
            "conf_med": c,
            "speedup": round(b / c, 3) if c else None,
        }
        print(f"# {n}: {out[n]['speedup']}x ({b} -> {c})", file=sys.stderr)
    tot_b = sum(med([run[n] for run in runs["base"]]) for n in args.names)
    tot_c = sum(med([run[n] for run in runs["conf"]]) for n in args.names)
    out["_total"] = {
        "base": round(tot_b, 3),
        "conf": round(tot_c, 3),
        "speedup": round(tot_b / tot_c, 3),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
