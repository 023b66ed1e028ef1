"""Item 6 (VERDICT r15): measure the Lloyd assignment-kernel crossover
at sf0.1 — expr (cross-join + HOF fold) vs Arrow (mapInPandas int64
matmul) — on the REAL consumer, dedup_semantic_clusters, plus the bare
lloyd_assignments operator, interleaved in one JVM with digests.

The kernel is chosen by ARROW_ASSIGN_CELLS (operators/similarity.py);
forcing each branch = setting the threshold to 0 (always Arrow) or a
huge value (never Arrow). Kernel equality is already pinned by
tests/test_llm_ops.py; this script records the WALL crossover evidence.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from jubilant_garbanzo_spark.operators import similarity as S  # noqa: E402
from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
PAIRS = 4


def run_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def digest(df):
    rows = df.collect()
    canon = sorted(tuple(str(v) for v in r) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()[:12], len(rows)


def main() -> int:
    specs = load_all()
    spark = get_spark("ab-lloyd-kernel")
    sem = specs["dedup_semantic_clusters"].fn

    from jubilant_garbanzo_spark.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    k = S.adaptive_k(n)
    print(f"# n={n} k={k} cells={n * k} threshold={S.ARROW_ASSIGN_CELLS}",
          file=sys.stderr)

    out: dict[str, dict] = {"n": n, "k": k, "cells": n * k}
    for name, frame in (
        ("lloyd_assignments", lambda: S.lloyd_assignments(
            emb.select(F.col("vec_id"), F.col("embedding")), n=n)),
        ("dedup_semantic_clusters", lambda: sem(spark, SF)),
    ):
        walls = {"expr": [], "arrow": []}
        # Warm both paths once (codegen + python worker spin-up).
        for thr in (10**18, 0):
            S.ARROW_ASSIGN_CELLS = thr
            run_noop(frame())
        for _ in range(PAIRS):
            S.ARROW_ASSIGN_CELLS = 10**18  # force expr kernel
            walls["expr"].append(run_noop(frame()))
            S.ARROW_ASSIGN_CELLS = 0  # force arrow kernel
            walls["arrow"].append(run_noop(frame()))
        S.ARROW_ASSIGN_CELLS = 10**18
        d_expr = digest(frame())
        S.ARROW_ASSIGN_CELLS = 0
        d_arrow = digest(frame())
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        out[name] = {
            "expr_walls": [round(w, 3) for w in walls["expr"]],
            "arrow_walls": [round(w, 3) for w in walls["arrow"]],
            "expr_med": round(med(walls["expr"]), 3),
            "arrow_med": round(med(walls["arrow"]), 3),
            "identical": d_expr == d_arrow,
            "rows": d_expr[1],
        }
        print(f"# {name}: expr {out[name]['expr_med']}s vs arrow "
              f"{out[name]['arrow_med']}s identical={d_expr == d_arrow}",
              file=sys.stderr)
    S.ARROW_ASSIGN_CELLS = 1_000_000  # restore
    print(json.dumps(out, indent=1))
    Path("/root/repo/plans/r16/evidence/ab_lloyd_kernel.json").write_text(
        json.dumps(out, indent=1)
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
