"""Incremental-gold hot-partition stress (VERDICT r7 #6).

Builds a synthetic silver table with ONE fat match (~1M deliveries —
the skewed-rescrape case) among N-1 normal matches (golden-fixture
volume), bootstraps the partials via the CLI incremental path, then
measures the per-batch cost of rescraping ONLY the fat match at 1x and
10x silver (10x = 10x the number of neighbor matches; the batch — the
fat match — is CONSTANT).

Claim under test (SCALE.md r7 third entry's cost model): per-batch
cost is O(batch deliveries) + O(keys x matches) for the finisher
merge, independent of total silver size. A flat 1x->10x scoped-rewrite
time proves the scoped path never rescans silver; the finisher merge
is allowed to grow ~linearly in MATCHES (skinny partials rows), which
at 10x matches is still orders of magnitude below O(silver deliveries).

Run:  python tools/incgold_stress.py [workdir]
Prints one result line per phase; paste the summary into SCALE.md.
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aws_ipl_data_pipeline_spark.cli import main as cli  # noqa: E402
from aws_ipl_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_ipl_data_pipeline_spark.sources.writers import (  # noqa: E402
    overwrite_table,
)


def build_silver(spark, n_matches: int, fat_rows: int):
    """Synthetic silver: match m0000 carries ``fat_rows`` deliveries,
    every other match ~240 (a real T20 volume). Columns cover what the
    partial builders consume."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from fixtures_ipl import match_meta, players, raw_deliveries  # noqa: E402

    from aws_ipl_data_pipeline_spark.plans import to_bronze, to_silver

    base = to_silver(
        to_bronze(raw_deliveries(spark)), match_meta(spark), players(spark)
    )
    m0 = base.select("match").distinct().orderBy("match").first()[0]
    one = base.where(F.col("match") == m0).localCheckpoint(eager=True)
    n_one = one.count()
    # fat match: replicate m0's deliveries up to fat_rows
    fat = (
        one.crossJoin(
            spark.range((fat_rows + n_one - 1) // n_one).select(
                F.col("id").alias("_rep")
            )
        )
        .drop("_rep")
        .withColumn("match", F.lit("m0000"))
    )
    # neighbors: one replica of m0's deliveries per synthetic match id
    neigh = (
        one.crossJoin(
            spark.range(1, n_matches).select(
                F.format_string("m%04d", F.col("id")).alias("_m")
            )
        )
        .withColumn("match", F.col("_m"))
        .drop("_m")
    )
    return fat.unionByName(neigh), n_one


def run_phase(spark, label: str, silver, silver_path: str, gold: str):
    overwrite_table(
        silver, silver_path, partition_by=["match", "innings"], fmt="parquet"
    )
    t0 = time.perf_counter()
    cli(["gold", "--silver", silver_path, "--out-dir", gold,
         "--gold-mode", "incremental"])
    boot = time.perf_counter() - t0
    # constant batch: rescrape ONLY the fat match (scoped rewrite +
    # finisher merge) — this is the per-batch cost the claim is about
    t0 = time.perf_counter()
    cli(["gold", "--silver", silver_path, "--out-dir", gold,
         "--gold-mode", "incremental", "--affected-matches", "m0000"])
    batch = time.perf_counter() - t0
    n = silver.count()
    print(
        f"{label}: silver_rows={n} bootstrap={boot:.2f}s "
        f"fat_match_batch={batch:.2f}s",
        flush=True,
    )
    return batch


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/incgold_stress"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(app_name="incgold-stress")
    spark.sparkContext.setLogLevel("ERROR")

    s1, _ = build_silver(spark, n_matches=40, fat_rows=1_000_000)
    b1 = run_phase(spark, "1x (40 matches, 1M-row fat match)",
                   s1, f"{work}/silver1", f"{work}/gold1")
    s10, _ = build_silver(spark, n_matches=400, fat_rows=1_000_000)
    b10 = run_phase(spark, "10x (400 matches, same fat match)",
                    s10, f"{work}/silver10", f"{work}/gold10")
    print(
        f"summary: constant-batch cost 1x={b1:.2f}s 10x={b10:.2f}s "
        f"ratio={b10 / b1:.2f} (flat ~= O(batch) proven; the finisher "
        f"merge's O(keys x matches) term is the only growth)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
