"""Count Spark jobs issued by one text_sparse_tfidf_cosine invocation.

Round-15 evidence for VERDICT r14 #6 (drop the per-call ``.first()``
probe): run the registered query end-to-end at the given SF and print
the number of Spark jobs the invocation issued, measured from the
status tracker's job-id high-water mark. Run on both sides of the edit
(git stash / stash pop) for the A/B.

Usage: PYTHONPATH=. python scripts/probe_tfidf_jobs.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from jubilant_garbanzo_spark.queries import load_all
from jubilant_garbanzo_spark.session import get_spark


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("probe-tfidf-jobs")
    spec = load_all()["text_sparse_tfidf_cosine"]
    # Warm the session (JVM, parquet footer caches) with one throwaway
    # run so the measured invocation is steady-state.
    spec.fn(spark, sf).collect()
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    all_before = set(tracker.getActiveJobsIds() or [])
    t0 = time.time()
    rows = spec.fn(spark, sf).collect()
    wall = time.time() - t0
    # Job ids are monotonically increasing ints; count ids above the
    # pre-invocation max across all groups.
    jsc = spark._jsc.sc().statusTracker()
    ids = sorted(jsc.getJobIdsForGroup(None))
    del before, all_before
    hi = max(ids) if ids else -1
    # Re-run once more and diff the high-water mark — this measures
    # exactly the jobs of a single steady-state invocation.
    rows2 = spec.fn(spark, sf).collect()
    ids2 = sorted(jsc.getJobIdsForGroup(None))
    hi2 = max(ids2) if ids2 else -1
    print(
        f"jobs_per_invocation={hi2 - hi} rows={len(rows)}/{len(rows2)} "
        f"wall={wall:.2f}s sf={sf}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
