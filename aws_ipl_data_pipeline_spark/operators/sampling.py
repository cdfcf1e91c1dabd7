"""Deterministic sampling operators for training-data pipelines.

Everything here is a pure function of the data — no RNG state — so
task retries, stragglers, and re-runs make identical decisions: the
property that keeps distributed sampling exactly-once without
coordination. The registered queries (`stratified_sample_by_source`,
`quality_weighted_sample`) delegate here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exact n rows per stratum in a deterministic hash order (a seeded
    shuffle every rerun reproduces). One shuffle on the stratum key; at
    corpus scale pre-filter each stratum on a hash prefix (keep ≫ n
    candidates) before ranking so no stratum concentrates on one task."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n_per_stratum)
    )


def weighted_sample(
    df: DataFrame,
    keep_prob: Column,
    id_col: str = "doc_id",
    buckets: int = 1000,
) -> DataFrame:
    """Keep each row with probability ``keep_prob`` (a Column in [0,1])
    decided by a multiplicative hash of the id into ``buckets`` — a
    map-only, shuffle-free plan whose decisions survive recomputation
    (no sampled-twice/never rows under task retry)."""
    bucket = (F.col(id_col) * F.lit(2654435761)) % buckets
    return df.where(bucket < keep_prob * buckets)
