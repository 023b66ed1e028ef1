"""Per-job wall-time profile for one registry query.

Runs the query once (noop sink) in a fresh session and prints every
Spark job the action spawned: job id, duration, #stages/tasks, and the
first line of the job name — localizes where an iterative query's
wall-clock actually goes (broadcast builds, checkpoint jobs, the final
collect). Usage:
    python profile_jobs.py [--sf DIR] name
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", default=None, help="warm-up query name")
    ap.add_argument("name")
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark("profile-jobs")
    if args.warm:
        specs[args.warm].fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()

    store = spark.sparkContext._jsc.sc().statusStore()
    before_ids = {j.jobId() for j in _jobs(store)}

    t0 = time.perf_counter()
    specs[args.name].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.perf_counter() - t0

    time.sleep(0.5)
    total = 0.0
    print(f"== {args.name}: wall {wall:.3f}s ==")
    for j in sorted(_jobs(store), key=lambda j: j.jobId()):
        if j.jobId() in before_ids:
            continue
        sub = j.submissionTime().get().getTime()
        comp = (
            j.completionTime().get().getTime()
            if j.completionTime().isDefined()
            else None
        )
        dur = (comp - sub) / 1000.0 if comp else float("nan")
        total += dur if comp else 0.0
        name = (j.name() or "").splitlines()[0][:110]
        print(
            f"job {j.jobId():4d}  {dur:7.3f}s  stages={j.stageIds().size()}"
            f"  tasks={j.numTasks():4d}  {name}"
        )
    print(f"== sum of job durations: {total:.3f}s (gaps = driver/planning) ==")


def _jobs(store):
    it = store.jobsList(None).iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    main()
