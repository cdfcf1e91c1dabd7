"""Sequence packing: lay documents head-to-tail into fixed token-budget
packs (the concat-then-chunk LM training layout).

Two forms:

* global — one total order (deterministic hash), one running total:
  the registered oracle query (`sequence_packing`). Exact single
  sequence space, but the window is a single partition — fine for a
  final small corpus, wrong for 100 TB.
* sharded — ``pack_sequences(df, shard_col=...)``: hash-partition
  first, run the same running-total expression within each shard, and
  namespace the pack id by shard. Every shard emits its own pack
  space, which is how LM data layouts are sharded in practice (each
  data worker consumes its own shard's packs). The plan shuffles on
  the shard key — no single-partition window — asserted in
  tests/test_plans.py-style gates in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each doc the pack it STARTS in plus its offset there.

    Output: input columns + (pack_id, pack_offset); with a shard
    column, pack_id is (shard, local pack) encoded as
    ``shard_ns * 2^32 + local_pack`` so ids stay unique and sortable
    across shards without coordination. The shard namespace is the
    first 20 bits of ``md5(shard)`` (5 hex chars) — chosen over
    xxhash64 because md5 is reproducible in ANSI SQL on both Spark and
    DuckDB, so the sharded layout can be oracle-checked end to end."""
    order = (F.md5(F.col(id_col).cast("string")), F.col(id_col))
    if shard_col is None:
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        base = docs.withColumn("_cum", F.sum(tokens_col).over(w))
        local = F.floor((F.col("_cum") - F.col(tokens_col)) / budget)
        pack = local.cast("long")
    else:
        w = (
            Window.partitionBy(shard_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        base = docs.withColumn("_cum", F.sum(tokens_col).over(w))
        local = F.floor((F.col("_cum") - F.col(tokens_col)) / budget)
        shard_ns = F.conv(
            F.substring(F.md5(F.col(shard_col).cast("string")), 1, 5), 16, 10
        ).cast("long")
        pack = (shard_ns * F.lit(1 << 32) + local).cast("long")
    return base.select(
        *docs.columns,
        pack.alias("pack_id"),
        ((F.col("_cum") - F.col(tokens_col)) % budget).cast("long").alias(
            "pack_offset"
        ),
    )


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str = "source",
) -> DataFrame:
    """Length-bucketed batch assignment — the padding-minimizing batch
    layout for non-packed LLM training/inference: within each shard,
    docs are ranked by descending token count (unique ``id_col``
    tiebreak) and chunked into fixed ``batch_size`` batches, so each
    batch holds near-equal-length docs and pads to its own max instead
    of the corpus max. Output adds ``batch_id``, ``batch_max_tokens``
    (the batch's padded width) and ``pad_waste`` (tokens of padding
    this doc costs at that width).

    Scale shape: ONE keyed exchange, on the shard key — the batch-max
    window's ClusteredDistribution(shard, batch_id) is already satisfied
    by hashpartitioning(shard) (a subset of the clustering keys), so
    Catalyst reuses the rank window's exchange (pinned in
    tests/test_plans.py::test_length_bucketed_batches_one_shard_exchange).
    Per-shard windows bounded by shard size, never a global sort; shard
    by a finer key when a single shard outgrows one task's sort budget
    (the same contract as shuffle_shards/pack_sequences)."""
    rn_w = Window.partitionBy(shard_col).orderBy(
        F.col(tokens_col).desc(), F.col(id_col)
    )
    out = (
        docs.withColumn("_rn", F.row_number().over(rn_w))
        .withColumn(
            "batch_id",
            F.floor((F.col("_rn") - 1) / batch_size).cast("long"),
        )
        .drop("_rn")
    )
    bmax_w = Window.partitionBy(shard_col, "batch_id")
    return out.withColumn(
        "batch_max_tokens", F.max(tokens_col).over(bmax_w).cast("long")
    ).withColumn(
        "pad_waste",
        (F.col("batch_max_tokens") - F.col(tokens_col)).cast("long"),
    )
