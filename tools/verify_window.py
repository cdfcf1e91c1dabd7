"""Driver-window / full-registry verification, exactly as the external
harness does it: a VANILLA SparkSession (none of the builder configs —
tune_session must be applied at runtime by the queries themselves) and
the DuckDB oracle compare from tests/oracle_check.

Usage:
  python tools/verify_window.py                 # first 50 (the driver window)
  python tools/verify_window.py --all           # full registry
  python tools/verify_window.py --names a,b,c   # scoped to named queries
  python tools/verify_window.py --sf-dir /root/testdata/sf0.001

Exit code 0 iff every oracle-backed query MATCHes (rows-only queries
just need to run).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", help="full registry, not just the window")
    ap.add_argument("--names", default=None, help="comma-separated query names")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from oracle_check import compare, duck_con

    qs, osql = E.queries(), E.oracle_sql()
    if args.names:
        names = [n.strip() for n in args.names.split(",")]
        missing = [n for n in names if n not in qs]
        if missing:
            print(f"unknown queries: {missing}")
            return 2
    elif args.all:
        names = list(qs)
    else:
        names = list(qs)[: args.window]

    smoke = len(E.entry(spark).collect())
    print(f"smoke rows: {smoke}")
    con = duck_con(args.sf_dir)
    bad, rows_only = [], 0
    t0 = time.time()
    for name in names:
        if name in osql:
            ok, msg = compare(qs[name](spark, args.sf_dir), con, osql[name])
            if not ok:
                bad.append(name)
                print(f"MISMATCH {name}: {msg}")
        else:
            rows_only += 1
            qs[name](spark, args.sf_dir).count()
    print(
        f"{len(names)} queries: {len(bad)} mismatches, {rows_only} rows-only,"
        f" {round(time.time() - t0, 1)}s"
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
