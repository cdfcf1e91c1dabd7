"""VERDICT r10 nit: confirm the minhash split-aggregate design still
wins at sf1 volume (10x of sf0.1 — the reference's ~league-year scale),
not only at the sf0.1 where it was first measured (r6: ~1.8x).

Rebuilds the FORMER shared-aggregate plan inline (one groupBy emitting
the k min-hashes AND the count AND the collect_set, every consumer
re-merging the set state) and times it against the shipped
minhash_lsh_pairs (split aggregates) on the scale_sweep replica
corpora. Both plans produce identical pairs (asserted on 1x).

Usage: python tools/minhash_split_probe.py [--scales 1,10] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    word_shingles,
)
from aws_ipl_data_pipeline_spark.session import get_spark
from tools.scale_sweep import build


def shared_agg_pairs(
    docs,
    n=3,
    num_hashes=64,
    bands=16,
    threshold=0.8,
    seed=42,
    max_bucket_size=256,
):
    """The r5-era SHARED aggregate: mins + count + collect_set in ONE
    groupBy — every consumer above the (deduped) exchange re-merges
    the collect_set state. Candidate generation and verification are
    otherwise identical to the shipped plan so the comparison isolates
    the aggregate split."""
    rows_per_band = num_hashes // bands
    sh = word_shingles(docs, "doc_id", "text", n).select(
        "_id", F.xxhash64("shingle").alias("_hs")
    )
    agg = sh.groupBy("_id").agg(
        *[
            F.min(F.xxhash64(F.lit(seed + i), F.col("_hs"))).alias(f"_h{i}")
            for i in range(num_hashes)
        ],
        F.count("*").alias("_n"),
        F.collect_set("_hs").alias("_set"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"_h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = agg.select("_id", F.explode(band_structs).alias("bb")).select(
        "_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    buckets = banded.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list("_id")).alias("_ids")
    )
    all_pairs = F.flatten(
        F.transform(
            F.slice("_ids", 1, F.size("_ids") - 1),
            lambda a, i: F.transform(
                F.slice(F.col("_ids"), i + 2, F.size("_ids")),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    star_pairs = F.transform(
        F.slice("_ids", 2, F.size("_ids")),
        lambda b: F.struct(
            F.element_at("_ids", 1).alias("id_a"), b.alias("id_b")
        ),
    )
    pairs_expr = (
        F.when(F.size("_ids") > max_bucket_size, star_pairs).otherwise(
            all_pairs
        )
        if max_bucket_size is not None
        else all_pairs
    )
    candidates = (
        buckets.where(F.size("_ids") >= 2)
        .select(F.explode(pairs_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates()
    )
    a = agg.select(
        F.col("_id").alias("id_a"),
        F.col("_n").alias("_na"),
        F.col("_set").alias("_sa"),
    )
    b = agg.select(
        F.col("_id").alias("id_b"),
        F.col("_n").alias("_nb"),
        F.col("_set").alias("_sb"),
    )
    common = F.size(F.array_intersect("_sa", "_sb"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", common / (F.col("_na") + F.col("_nb") - common)
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = get_spark(app_name="minhash-split-probe")
    rows = []
    for mult in scales:
        sf_dir = build(spark, mult)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if mult == scales[0]:
            split_out = {
                tuple(r) for r in minhash_lsh_pairs(docs).collect()
            }
            shared_out = {tuple(r) for r in shared_agg_pairs(docs).collect()}
            assert split_out == shared_out, (
                f"plans diverge: {len(split_out)} vs {len(shared_out)}"
            )
            print(
                f"  identical output at {mult}x: {len(split_out)} pairs",
                file=sys.stderr,
            )
        t = {}
        for label, fn in (
            ("split", lambda d: minhash_lsh_pairs(d)),
            ("shared", lambda d: shared_agg_pairs(d)),
        ):
            runs = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            t[label] = round(min(runs), 2)
            print(f"  {mult}x {label}: {t[label]}s  {runs}", file=sys.stderr)
        rows.append((mult, t["split"], t["shared"]))

    print("\n| scale | split (shipped) | shared (r5-era) | split advantage |")
    print("|---|---|---|---|")
    for mult, sp, sh in rows:
        print(f"| {mult}x | {sp} s | {sh} s | {sh / sp:.2f}x |")


if __name__ == "__main__":
    main()
