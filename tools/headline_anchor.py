"""10x headline scale anchor (VERDICT r6 item 8): run the frozen
24-query bench headline set at 1x (sf0.1) and 10x (tools/scale_sweep
replicas — documents/embeddings/events/TPC-H, all linear-growth by
construction) interleaved in ONE JVM, and print the SCALE.md table.

Interleaved same-JVM A/B is the established methodology: per-query
fresh-JVM best-of-N overstates codegen-heavy plans (memory note r6).
Growth factor ~= 10 means the query is data-bound (perfectly linear);
< 10 means fixed overheads still dominate at sf1-equivalent; > 10 is
a superlinear cliff that needs investigation.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from aws_ipl_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from aws_ipl_data_pipeline_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402
from tools import scale_sweep as SW  # noqa: E402

# IPL queries run on replicated in-session fixtures, independent of
# sf_dir — their 10x point measures the same data and is flagged so.
# (standings_points is NOT here: despite the name it is a TPC-H
# orders-join-customer query over sf_dir — its 10x point is real.)
SF_INDEPENDENT = {"ipl_gold_e2e"}


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="headline-anchor")
    spark.sparkContext.setLogLevel("ERROR")
    ten = SW.build(spark, 10)
    SW.build_events(spark, 10, ten)
    SW.build_tpch(spark, 10, ten)
    dirs = {"1x": SW.BASE, "10x": ten}

    from bench import _calib_once  # fixed-shape box-noise probe (r8)

    _calib_once(spark)  # warm the probe's own codegen
    calib: list[float] = []
    best: dict[str, dict[str, float]] = {q: {} for q in HEADLINE}
    for it in range(iters):
        for name in HEADLINE:
            for label, d in dirs.items():
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                cur = best[name].get(label)
                best[name][label] = dt if cur is None or dt < cur else cur
        calib.append(round(_calib_once(spark), 3))
        print(f"iter {it + 1}/{iters} done (calib {calib[-1]}s)", file=sys.stderr)

    print("| query | 1x (s) | 10x (s) | growth |")
    print("|---|---|---|---|")
    t1 = t10 = 0.0
    for name in HEADLINE:
        a, b = best[name]["1x"], best[name]["10x"]
        t1 += a
        t10 += b
        note = " (sf-independent IPL fixtures)" if name in SF_INDEPENDENT else ""
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x{note} |")
    print(f"| **total** | **{t1:.2f}** | **{t10:.2f}** | **{t10 / t1:.1f}x** |")
    print(f"calib probe per iter: {calib}")


if __name__ == "__main__":
    main()
