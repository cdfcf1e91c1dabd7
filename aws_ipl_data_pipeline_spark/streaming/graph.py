"""Streaming co-visitation edge maintenance: keep the item-transition
edge table (`operators/graph.covisit_edges`) current as event files
land, without ever rescanning admitted history.

State is the per-user TAIL — each user's latest (item, ts, event_id) —
so a transition that straddles a batch boundary (user's last event in
batch N, first event in batch N+1) is stitched exactly once. Both
tables are append-only:

* ``out_path``: per-batch edge-weight DELTAS (batch_id, src, dst, w).
  The current edge set is ``read → dropDuplicates(batch_id, src, dst)
  → groupBy(src, dst).sum(w)`` (see :func:`read_covisit_edges`); the
  dropDuplicates makes a replayed batch idempotent — within one batch
  each (src, dst) emits exactly one delta row, so (batch_id, src, dst)
  is a natural idempotence key and an at-least-once retry can never
  inflate a weight. Compact with sources/maintenance when delta files
  accumulate.
* ``{out_path}_tail``: per-user tail rows appended per batch; reads
  take the latest row per user (max (ts, event_id)) so duplicates from
  a replay are absorbed by latest-wins.

Ordering contract: a user's events must arrive in event-time order
ACROSS batches (the standard log-append ingestion assumption — the
file source lists files in drop order). Within a batch, ordering is
re-derived from (ts, event_id), so intra-batch file order is free.

Downstream consumers (`pagerank_fixed_int`, `triangle_counts`) take
the compacted edge set as-is — index maintenance and analytics stay
decoupled, the same split as the streaming IVF maintenance module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

TAIL_SUFFIX = "_tail"


def read_covisit_edges(spark: SparkSession, out_path: str) -> DataFrame:
    """Current (src, dst, w) edge set from the delta table — replay-safe
    via the (batch_id, src, dst) idempotence key."""
    return (
        spark.read.parquet(out_path)
        .dropDuplicates(["batch_id", "src", "dst"])
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("w"))
    )


def run_covisit_edge_ingest(
    spark: SparkSession,
    events_dir: str,
    out_path: str,
    checkpoint_dir: str,
    schema,
    item_json_path: str = "$.k",
    available_now: bool = True,
):
    """Start the co-visitation edge maintenance stream; returns the
    StreamingQuery. Each micro-batch computes its intra-batch
    transitions, stitches the batch-boundary transition per user from
    the tail state, appends ONE delta row per (src, dst), and appends
    the new per-user tails."""
    tail_path = f"{out_path.rstrip('/')}{TAIL_SUFFIX}"
    stream = spark.readStream.schema(schema).parquet(events_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        k = F.get_json_object("props", item_json_path).cast("long")
        ev = batch_df.select(
            "user_id", "ts", "event_id", k.alias("k")
        ).where(k.isNotNull())
        ev = ev.localCheckpoint(eager=True)  # consumed 4x below
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        # intra-batch transitions
        intra = (
            ev.withColumn("_prev", F.lag("k").over(w))
            .where(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("k")))
            .select(F.col("_prev").alias("src"), F.col("k").alias("dst"))
        )
        # boundary transitions: tail(user) -> first batch event(user)
        firsts = (
            ev.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("user_id", F.col("k").alias("_first_k"))
        )
        try:
            tail = _latest_tails(spark.read.parquet(tail_path))
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            tail = None
        if tail is not None:
            boundary = (
                firsts.join(tail.withColumnRenamed("k", "_tail_k"), "user_id")
                .where(F.col("_tail_k") != F.col("_first_k"))
                .select(
                    F.col("_tail_k").alias("src"),
                    F.col("_first_k").alias("dst"),
                )
            )
            intra = intra.unionByName(boundary)
        deltas = (
            intra.groupBy("src", "dst")
            .agg(F.count("*").cast("long").alias("w"))
            .select(F.lit(batch_id).cast("long").alias("batch_id"), "*")
        )
        deltas.write.mode("append").parquet(out_path)
        # new tails: the batch's last event per user (users absent from
        # this batch keep their old rows — latest-wins on read)
        lasts = (
            ev.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.desc("ts"), F.desc("event_id")
                    )
                ),
            )
            .where(F.col("_rn") == 1)
            .select("user_id", "k", "ts", "event_id")
        )
        lasts.write.mode("append").parquet(tail_path)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _latest_tails(tails: DataFrame) -> DataFrame:
    """Latest tail row per user — absorbs replay duplicates."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        tails.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "k")
    )
