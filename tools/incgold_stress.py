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


def build_silver(spark, n_matches: int, fat_rows: int, neighbor_rep: int = 1):
    """Synthetic silver: match m0000 carries ``fat_rows`` deliveries,
    every other match ~240 x ``neighbor_rep`` (a real T20 volume at
    rep=1). Columns cover what the partial builders consume."""
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
    # neighbors: ``neighbor_rep`` replicas of m0's deliveries per
    # synthetic match id
    neigh = (
        one.crossJoin(
            spark.range(1, n_matches).select(
                F.format_string("m%04d", F.col("id")).alias("_m")
            )
        )
        .crossJoin(spark.range(neighbor_rep).select(F.col("id").alias("_nr")))
        .withColumn("match", F.col("_m"))
        .drop("_m", "_nr")
    )
    return fat.unionByName(neigh), n_one


def run_phase(
    spark,
    label: str,
    silver,
    silver_path: str,
    gold: str,
    compact_partials: bool = False,
):
    from aws_ipl_data_pipeline_spark.plans.gold_incremental import (
        PARTIAL_BUILDERS,
    )
    from aws_ipl_data_pipeline_spark.sources.maintenance import (
        compact,
        data_file_count,
    )

    overwrite_table(
        silver, silver_path, partition_by=["match", "innings"]
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
    if not compact_partials:
        return batch
    # maintenance in the loop (VERDICT r8 #3): pack each partials table
    # (bounding files-per-partition-dir that scoped dynamic overwrites
    # accumulate), then re-measure the same constant batch — the delta
    # isolates how much of the per-batch cost is file listing vs the
    # O(keys x matches) finisher merge
    files_before = sum(
        data_file_count(spark, f"{gold}/_partials_{p}") for p in PARTIAL_BUILDERS
    )
    t0 = time.perf_counter()
    for pname in PARTIAL_BUILDERS:
        compact(spark, f"{gold}/_partials_{pname}")
    ct = time.perf_counter() - t0
    files_after = sum(
        data_file_count(spark, f"{gold}/_partials_{p}") for p in PARTIAL_BUILDERS
    )
    t0 = time.perf_counter()
    cli(["gold", "--silver", silver_path, "--out-dir", gold,
         "--gold-mode", "incremental", "--affected-matches", "m0000"])
    batch_post = time.perf_counter() - t0
    print(
        f"{label}: partials files {files_before}->{files_after} "
        f"(compact {ct:.2f}s) fat_match_batch_post_compact={batch_post:.2f}s",
        flush=True,
    )
    return batch, batch_post


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/incgold_stress"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(app_name="incgold-stress")
    spark.sparkContext.setLogLevel("ERROR")

    s1, n_one = build_silver(spark, n_matches=40, fat_rows=1_000_000)
    b1 = run_phase(spark, "1x (40 matches, 1M-row fat match)",
                   s1, f"{work}/silver1", f"{work}/gold1")
    # VOLUME axis: ~10x the silver DELIVERIES (neighbor rows x~900,
    # match count constant), batch unchanged — the O(batch)-not-
    # O(silver) claim measured on the axis that grows at 100 TB
    vol_rep = (9_000_000 // ((40 - 1) * n_one)) + 1
    s10v, _ = build_silver(
        spark, n_matches=40, fat_rows=1_000_000, neighbor_rep=vol_rep
    )
    b10v = run_phase(spark, "10x volume (40 matches, ~10M silver rows)",
                     s10v, f"{work}/silver10v", f"{work}/gold10v")
    # MATCHES axis: 10x the partials partitions (the finisher merge's
    # O(keys x matches) term + per-partition listing), batch unchanged
    s10m, _ = build_silver(spark, n_matches=400, fat_rows=1_000_000)
    b10m = run_phase(spark, "10x matches (400 matches, same fat match)",
                     s10m, f"{work}/silver10m", f"{work}/gold10m")
    # 100x MATCHES with maintenance in the loop (VERDICT r8 #3): the
    # r8 run measured 1.71x per-batch at 10x matches — here the same
    # constant batch runs at 4000 matches, before AND after a partials
    # compaction pass, separating the file-listing share (bounded by
    # compaction) from the O(keys x matches) finisher merge (inherent)
    s100m, _ = build_silver(spark, n_matches=4000, fat_rows=1_000_000)
    b100m, b100mc = run_phase(
        spark, "100x matches (4000 matches, same fat match)",
        s100m, f"{work}/silver100m", f"{work}/gold100m",
        compact_partials=True,
    )
    print(
        f"summary: constant-batch cost 1x={b1:.2f}s "
        f"10x-volume={b10v:.2f}s (ratio {b10v / b1:.2f}; flat = the "
        f"scoped path never rescans silver) "
        f"10x-matches={b10m:.2f}s (ratio {b10m / b1:.2f}) "
        f"100x-matches={b100m:.2f}s pre-compact, {b100mc:.2f}s "
        f"post-compact (ratio {b100mc / b1:.2f}; growth = the "
        f"documented O(keys x matches) finisher merge + partition "
        f"listing, never O(silver deliveries))",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
