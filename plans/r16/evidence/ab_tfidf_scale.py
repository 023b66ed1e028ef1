"""At-scale validation of the round-16 sparse-TFIDF restructure:
interleave the r15 body (posting self-join) vs the new body (in-array
pair expansion) on the x10 scale-decade corpus (bench_scale's
deterministic replica construction), in one JVM, digests compared.

The sf0.1 A/B read 1.275x; the removed term — two corpus-sized posting
shuffles plus a join — grows with data, so the decade run is the
at-scale evidence for the claim.
"""

from __future__ import annotations

import hashlib
import importlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import bench_scale as BS  # noqa: E402
from ab_round import OLD_PKG, materialize_rev  # noqa: E402

from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 10
QUERY = sys.argv[2] if len(sys.argv) > 2 else "text_sparse_tfidf_cosine"
DEST = f"{BS.WORK}/x{SCALE}"
PAIRS = 4
REV = "36e08b1"


def run_once(spark, fn, sf_dir):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def digest(spark, fn, sf_dir):
    rows = fn(spark, sf_dir).collect()
    canon = sorted(tuple(str(v) for v in r) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()[:12], len(rows)


def main() -> int:
    root = materialize_rev(REV)
    sys.path.insert(0, str(root))
    old_specs = importlib.import_module(f"{OLD_PKG}.queries").load_all()
    new_specs = load_all()
    spark = get_spark("ab-tfidf-scale")
    if not BS.reusable(DEST, SCALE, skip_relational=True):
        print(f"# generating x{SCALE} corpus at {DEST}", file=sys.stderr)
        BS.generate(spark, SCALE, DEST, skip_relational=True)

    name = QUERY
    old_fn, new_fn = old_specs[name].fn, new_specs[name].fn
    # Warm both variants.
    run_once(spark, old_fn, DEST)
    run_once(spark, new_fn, DEST)
    walls = {"old": [], "new": []}
    for _ in range(PAIRS):
        walls["old"].append(run_once(spark, old_fn, DEST))
        walls["new"].append(run_once(spark, new_fn, DEST))
    d_old = digest(spark, old_fn, DEST)
    d_new = digest(spark, new_fn, DEST)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {
        "scale": SCALE,
        "rev_old": REV,
        "old_walls": [round(w, 3) for w in walls["old"]],
        "new_walls": [round(w, 3) for w in walls["new"]],
        "old_med": round(med(walls["old"]), 3),
        "new_med": round(med(walls["new"]), 3),
        "speedup": round(med(walls["old"]) / med(walls["new"]), 3),
        "wins": sum(1 for a, b in zip(walls["old"], walls["new"]) if b < a),
        "identical": d_old == d_new,
        "rows": d_new[1],
    }
    print(json.dumps(out, indent=1))
    Path(f"/root/repo/plans/r16/evidence/ab_{QUERY.split(chr(95))[1]}_scale_x{SCALE}.json" if QUERY != "text_sparse_tfidf_cosine" else f"/root/repo/plans/r16/evidence/ab_tfidf_scale_x{SCALE}.json").write_text(
        json.dumps(out, indent=1)
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
