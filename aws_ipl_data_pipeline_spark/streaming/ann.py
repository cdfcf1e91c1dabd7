"""Streaming ANN index maintenance: keep the partitioned IVF index
(`operators/similarity.write_ivf_index`) current as new embedding files
land, without ever rebuilding the corpus side.

The coarse quantizer (centroid set) is FROZEN index metadata: every
micro-batch cell-assigns against the same centroids and appends to its
cell partitions, so reads stay consistent — a probe prunes to the same
cell directories before and after any batch, and a vector's cell never
changes under re-assignment (standard faiss/Milvus practice: recluster
= offline index rebuild, not an ingest-path concern). Because appends
are partition-local parquet files, a live probe simply sees the new
files on its next directory listing; there is no compaction barrier in
the read path (run `operators/similarity.compact_ivf_index` when small
files or retry duplicates accumulate — it re-packs the cell layout,
dedupes at rest, and refreshes the stats table in one step).

Exactly-once story: the file source tracks processed input files in the
checkpoint, and the index append is the batch's ONLY write — a retry
after a crash re-appends the same vectors. The read path absorbs that:
`probe_ivf_index` dedupes candidates by id before ranking (so a
duplicated neighbor can never occupy two of the k result rows), and a
periodic per-cell compaction removes the physical duplicates; same
at-least-once-then-dedupe posture as the corpus ingest stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_ipl_data_pipeline_spark.operators.similarity import add_ivf_cell


def run_ivf_index_ingest(
    spark: SparkSession,
    emb_dir: str,
    index_path: str,
    checkpoint_dir: str,
    schema,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    available_now: bool = True,
    stats_cols: list[str] | None = None,
):
    """Start the IVF index maintenance stream; returns the
    StreamingQuery. ``centroids`` are the frozen quantizer from the
    initial `write_ivf_index` build (persist them beside the index).

    ``stats_cols`` keeps the filtered-probe stats table
    (``write_ivf_index(stats_cols=...)``,
    ``similarity.filtered_probe_ivf_index``) current under streaming
    appends WITHOUT scanning the index: each batch appends its own
    (cell, *stats_cols, cnt) PARTIAL rows — a batch-local aggregate —
    and the probe's stats read sums partials, so counts stay exact
    under clean delivery. The two appends are NOT atomic; either drift
    direction is recall-safe-but-imperfect and repaired the same way:
    a retried batch OVERCOUNTS stats (its vectors dedupe at probe
    time; its stats rows do not — widening stops early, costing
    recall-margin never precision), and a crash BETWEEN the index
    append and the stats append UNDERCOUNTS (the widening cut probes
    too far — recall-safe but cost-unbounded until repaired). Run
    ``similarity.refresh_ivf_stats`` with the periodic per-cell
    compaction to restore exact counts after either hazard."""
    stream = spark.readStream.schema(schema).parquet(emb_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # cell-assign ONCE per batch: both writes read the pinned frame
        # (no re-read/re-assign of the source for the stats pass, and no
        # chance the two writes see different assignments).
        celled = add_ivf_cell(batch_df, centroids, vec_col).localCheckpoint(
            eager=True
        )
        try:
            celled.write.partitionBy("cell").mode("append").parquet(index_path)
            if stats_cols:
                from pyspark.sql import functions as F

                from aws_ipl_data_pipeline_spark.operators.similarity import (
                    IVF_STATS_SUFFIX,
                )

                (
                    celled.groupBy("cell", *stats_cols)
                    .agg(F.count("*").alias("cnt"))
                    .write.mode("append")
                    .parquet(index_path + IVF_STATS_SUFFIX)
                )
        finally:
            celled.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
