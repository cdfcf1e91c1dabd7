"""A/B probe for the minhash aggregate shape: SHARED (shipped) vs
SPLIT (historical r6-r10 design).

Since commit 56099a9 (r11) the shipped ``minhash_lsh_pairs`` uses ONE
shared per-doc aggregate (the k min-hashes AND the verification state —
count + shingle-hash set — in a single scan+explode+exchange). This tool
rebuilds the FORMER SPLIT plan inline (two aggregations over the same
shingle stream: a signature-only groupBy feeding the banding, and a
separate count+collect_set groupBy joined in only at verification) and
times it against the shipped shared plan on the scale_sweep replica
corpora. Both plans produce identical pairs (asserted on the first
scale).

The r11 measurement that motivated the revert (best-of-6 at 10x of
sf0.1): shared 2.43 s vs split 2.61 s — one pass over the shingle
stream beats two once only the bucket agg reads the signatures. Re-run
this tool at HEAD to reproduce that comparison; a 'shared advantage'
below 1.0x at production-like scale is the signal to reconsider.

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


def split_agg_pairs(
    docs,
    n=3,
    num_hashes=64,
    bands=16,
    threshold=0.8,
    seed=42,
    max_bucket_size=256,
):
    """The r6-r10-era SPLIT aggregates: the shingle stream is aggregated
    TWICE — once into the k min-hash signatures (feeding the banding),
    once into the verification state (count + shingle-hash set), joined
    back only per candidate pair. Candidate generation and verification
    are otherwise identical to the shipped plan so the comparison
    isolates the aggregate shape."""
    rows_per_band = num_hashes // bands
    sh = word_shingles(docs, "doc_id", "text", n).select(
        "_id", F.xxhash64("shingle").alias("_hs")
    )
    sig = sh.groupBy("_id").agg(
        *[
            F.min(F.xxhash64(F.lit(seed + i), F.col("_hs"))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    ver = sh.groupBy("_id").agg(
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
    banded = sig.select("_id", F.explode(band_structs).alias("bb")).select(
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
    a = ver.select(
        F.col("_id").alias("id_a"),
        F.col("_n").alias("_na"),
        F.col("_set").alias("_sa"),
    )
    b = ver.select(
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
            shared_out = {
                tuple(r) for r in minhash_lsh_pairs(docs).collect()
            }
            split_out = {tuple(r) for r in split_agg_pairs(docs).collect()}
            assert shared_out == split_out, (
                f"plans diverge: {len(shared_out)} vs {len(split_out)}"
            )
            print(
                f"  identical output at {mult}x: {len(shared_out)} pairs",
                file=sys.stderr,
            )
        t = {}
        for label, fn in (
            ("shared", lambda d: minhash_lsh_pairs(d)),
            ("split", lambda d: split_agg_pairs(d)),
        ):
            runs = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            t[label] = round(min(runs), 2)
            print(f"  {mult}x {label}: {t[label]}s  {runs}", file=sys.stderr)
        rows.append((mult, t["shared"], t["split"]))

    print("\n| scale | shared (shipped) | split (r6-r10-era) | shared advantage |")
    print("|---|---|---|---|")
    for mult, sh, sp in rows:
        print(f"| {mult}x | {sh} s | {sp} s | {sp / sh:.2f}x |")


if __name__ == "__main__":
    main()
