"""Same-session A/B: HDFS-backed vs RocksDB state store provider on
the stateful streaming family (VERDICT r9 #8).

PySpark 4.1 bundles RocksDBStateStoreProvider; at cluster scale it is
the right backend (state ≫ executor heap, incremental changelog
checkpoints), while at test scale its per-partition instance startup
can dominate. This script measures that trade on THIS host, same
session, interleaved A/B/A/B per query (cross-boot walls vary ~25%,
so only within-session comparisons are meaningful), and verifies both
providers produce identical rows.

Usage: python scripts/ab_state_store.py [--sf DIR] [--runs N] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

#: The stateful family: every query whose executor-side state store
#: actually carries per-key state across micro-batches (arbitrary
#: stateful ops, chained windowed aggs, watermarked dedup/joins).
FAMILY: tuple[str, ...] = (
    "stream_stateful_running_count",
    "stream_session_ttl",
    "stream_attribution_last_touch",
    "stream_chained_agg",
    "stream_dedup_within_watermark",
    "stream_stream_join",
)


def run_once(spark, spec, sf_dir: str) -> tuple[float, int, str]:
    t0 = time.perf_counter()
    rows = spec.fn(spark, sf_dir).collect()
    dt = time.perf_counter() - t0
    canon = sorted(tuple(str(v) for v in r) for r in rows)
    digest = hashlib.md5(repr(canon).encode()).hexdigest()[:12]
    return dt, len(rows), digest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2, help="A/B pairs per query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    names = args.names or [n for n in FAMILY if n in specs]
    spark = get_spark("ab-state-store")

    # Warm-up (JVM + codegen), then interleaved pairs.
    specs[names[0]].fn(spark, args.sf).collect()

    out: dict[str, dict] = {}
    for name in names:
        walls: dict[str, list[float]] = {"hdfs": [], "rocksdb": []}
        digests: dict[str, set] = {"hdfs": set(), "rocksdb": set()}
        counts: dict[str, set] = {"hdfs": set(), "rocksdb": set()}
        for _ in range(args.runs):
            for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
                spark.conf.set(PROVIDER_KEY, provider)
                try:
                    dt, n, dg = run_once(spark, specs[name], args.sf)
                finally:
                    spark.conf.unset(PROVIDER_KEY)
                walls[label].append(round(dt, 3))
                digests[label].add(dg)
                counts[label].add(n)
        same = (
            digests["hdfs"] == digests["rocksdb"]
            and len(digests["hdfs"]) == 1
            and counts["hdfs"] == counts["rocksdb"]
        )
        best = {k: min(v) for k, v in walls.items()}
        out[name] = {
            "hdfs_walls": walls["hdfs"],
            "rocksdb_walls": walls["rocksdb"],
            "hdfs_best": best["hdfs"],
            "rocksdb_best": best["rocksdb"],
            "rocksdb_over_hdfs": round(best["rocksdb"] / best["hdfs"], 3),
            "outputs_identical": same,
            "rows": sorted(counts["hdfs"] | counts["rocksdb"]),
        }
        print(
            f"# {name}: hdfs {best['hdfs']:.2f}s rocksdb {best['rocksdb']:.2f}s "
            f"ratio {out[name]['rocksdb_over_hdfs']}x identical={same}",
            file=sys.stderr,
        )

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
