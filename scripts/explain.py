"""EXPLAIN surface: print the optimized + physical plan of any
registered query (SURVEY §3.2 — the engine's `EXPLAIN` entry point).

Usage: python scripts/explain.py [--sf DIR] [--mode formatted] name ...
"""

from __future__ import annotations

import argparse
import sys

from jubilant_garbanzo_spark.queries import load_all
from jubilant_garbanzo_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark("explain")
    for name in args.names:
        df = specs[name].fn(spark, args.sf)
        print(f"==== {name} ====")
        print(
            spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), args.mode
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
