"""Re-check the round-15 SHJ session lever on this box (the r14-vs-r15
attribution run read tpch_q7 0.90x wins 0/3, the opposite of r15's
ab_shj_full 1.40x): interleave SMJ-default vs SHJ-preference by
mutating session.RUNTIME_CONF itself (configure_runtime re-applies the
dict inside every load_table, so plain conf A/Bs get stomped).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from jubilant_garbanzo_spark import session as S  # noqa: E402
from jubilant_garbanzo_spark.queries import load_all  # noqa: E402

SF = "/root/testdata/sf0.1"
PAIRS = 5
NAMES = [
    "tpch_q7_nation_volume",
    "tpch_q5_local_supplier_volume",
    "tpch_q19_disjunctive",
    "tpch_q18_large_volume_customers",
    "sql_recursive_cte_reachability",
]

SHJ = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
}
SMJ = {
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0b",
}


def set_variant(conf):
    S.RUNTIME_CONF.update(conf)


def run_once(spark, fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def digest(spark, fn):
    rows = fn(spark, SF).collect()
    canon = sorted(tuple(str(v) for v in r) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()[:12], len(rows)


def main() -> int:
    specs = load_all()
    spark = S.get_spark("ab-shj-recheck")
    set_variant(SHJ)
    run_once(spark, specs[NAMES[0]].fn)  # warm-up
    set_variant(SMJ)
    run_once(spark, specs[NAMES[0]].fn)

    out = {}
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for name in NAMES:
        walls = {"smj": [], "shj": []}
        for _ in range(PAIRS):
            set_variant(SMJ)
            walls["smj"].append(run_once(spark, specs[name].fn))
            set_variant(SHJ)
            walls["shj"].append(run_once(spark, specs[name].fn))
        set_variant(SMJ)
        d_a = digest(spark, specs[name].fn)
        set_variant(SHJ)
        d_b = digest(spark, specs[name].fn)
        out[name] = {
            "smj_walls": [round(w, 3) for w in walls["smj"]],
            "shj_walls": [round(w, 3) for w in walls["shj"]],
            "smj_med": round(med(walls["smj"]), 3),
            "shj_med": round(med(walls["shj"]), 3),
            "shj_speedup": round(med(walls["smj"]) / med(walls["shj"]), 3),
            "shj_wins": sum(
                1 for a, b in zip(walls["smj"], walls["shj"]) if b < a
            ),
            "identical": d_a == d_b,
        }
        print(f"# {name}: shj {out[name]['shj_speedup']}x "
              f"(wins {out[name]['shj_wins']}/{PAIRS}) "
              f"identical={d_a == d_b}", file=sys.stderr)
    set_variant(SHJ)  # restore the committed default
    print(json.dumps(out, indent=1))
    Path("/root/repo/plans/r16/evidence/ab_shj_recheck.json").write_text(
        json.dumps(out, indent=1)
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
