"""Sweep EVERY registered query and split its cost into DataFrame
BUILD time (fn() — pure Python/py4j plus any internal driver jobs)
and EXECUTION time (noop sink), best-of-N each, in one JVM.

The r12 finding this tool operationalizes: several queries' apparent
runtime was dominated by driver-side expression construction (py4j
literal storms) or eager checkpoint planning, invisible to plan
inspection. Writes /tmp/build_exec_sweep.json and prints the top
offenders by build share.

Usage: python tools/build_exec_sweep.py [--iters 2] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_ipl_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from aws_ipl_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/build_exec_sweep.json")
    args = ap.parse_args()

    spark = get_spark(app_name="build-exec-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    out: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        fn = spec.fn
        builds, execs = [], []
        try:
            for _ in range(args.iters + 1):  # +1 warmup, keep best of all
                t0 = time.perf_counter()
                df = fn(spark, args.sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                builds.append(t1 - t0)
                execs.append(t2 - t1)
        except Exception as e:  # pragma: no cover - sweep robustness
            out[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        out[name] = {
            "build": round(min(builds), 3),
            "exec": round(min(execs), 3),
            "total": round(min(b + e for b, e in zip(builds, execs)), 3),
        }
        print(
            f"{name}: build {out[name]['build']}s exec {out[name]['exec']}s",
            file=sys.stderr,
        )
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)

    rows = [
        (v["build"], v["exec"], k)
        for k, v in out.items()
        if "build" in v
    ]
    print("\n== top by BUILD time ==")
    for b, e, k in sorted(rows, reverse=True)[:25]:
        print(f"build {b:6.2f}s exec {e:6.2f}s  {k}")
    print("\n== top by EXEC time ==")
    for b, e, k in sorted(rows, key=lambda r: -r[1])[:25]:
        print(f"build {b:6.2f}s exec {e:6.2f}s  {k}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
