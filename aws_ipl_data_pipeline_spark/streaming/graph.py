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
* ``{out_path}_tail``: per-user tail rows appended per batch, stamped
  with the writing batch_id. The boundary stitch reads only rows with
  ``batch_id < current`` — a replayed batch therefore sees the SAME
  tail view as its first attempt (its own prior append is excluded),
  recomputes bit-identical deltas, and the idempotence key absorbs the
  duplicate rows. Reads take the latest row per user among the visible
  ones; :func:`compact_covisit_tails` rewrites the table to one row
  per user when history accumulates (offline maintenance, same posture
  as delta compaction).

Ordering contract: a user's events must arrive in event-time order
ACROSS batches (the standard log-append ingestion assumption — the
file source lists files in drop order). Within a batch, ordering is
re-derived from (ts, event_id), so intra-batch file order is free.

Intra-batch transitions come from `operators/graph.covisit_edges`
itself — the stream and the batch operator cannot drift because they
share the code whose equivalence the stream≡batch test asserts.

Downstream consumers (`pagerank_fixed_int`, `triangle_counts`) take
the compacted edge set as-is — index maintenance and analytics stay
decoupled, the same split as the streaming IVF maintenance module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# Explicit committed-table probe (ADVICE r6 + r7 second review):
# distinguishing 'first batch, no state yet' by substring-matching
# AnalysisException text is version/locale-dependent, and a bare
# dir-exists probe would treat the empty dir a CRASHED first append
# leaves behind as a live table (schema-less read -> crash loop on
# every retry). table_exists requires the _SUCCESS job marker.
# Probe-then-read on tail_path is race-free only because writes are
# serialized: the stream appends from within its own micro-batches,
# and compact_covisit_tails (which OVERWRITES tail_path) is documented
# offline-only — running it concurrently was never safe and the probe
# does not change that.
from aws_ipl_data_pipeline_spark.sources.readers import table_exists as _table_exists

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


def process_covisit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    tail_path: str,
    item_json_path: str = "$.k",
) -> None:
    """One micro-batch of the edge maintenance — module-level so tests
    can drive replays directly: running the same (batch_df, batch_id)
    twice must leave the readable edge set unchanged."""
    from aws_ipl_data_pipeline_spark.operators.graph import covisit_edges

    if batch_df.isEmpty():
        return
    k = F.get_json_object("props", item_json_path).cast("long")
    ev = batch_df.select("user_id", "ts", "event_id", k.alias("k")).where(
        k.isNotNull()
    )
    ev = ev.localCheckpoint(eager=True)  # consumed 4x below
    # intra-batch transitions: the batch operator itself (shared code —
    # the stream cannot drift from what the equivalence test pins)
    intra = covisit_edges(ev, F.col("k"))
    # boundary transitions: tail(user) -> first batch event(user), over
    # tails from STRICTLY EARLIER batches only, so a replay of this
    # batch sees the same tail view as its first attempt (its own
    # prior append is invisible) and recomputes identical deltas
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", F.col("k").alias("_first_k"))
    )
    if _table_exists(spark, tail_path):
        prior = spark.read.parquet(tail_path).where(
            F.col("batch_id") < F.lit(batch_id)
        )
        tail = _latest_tails(prior)
    else:
        tail = None
    boundary = None
    if tail is not None:
        boundary = (
            firsts.join(tail.withColumnRenamed("k", "_tail_k"), "user_id")
            .where(F.col("_tail_k") != F.col("_first_k"))
            .groupBy(
                F.col("_tail_k").alias("src"), F.col("_first_k").alias("dst")
            )
            .agg(F.count("*").cast("long").alias("w"))
        )
    merged = intra if boundary is None else intra.unionByName(boundary)
    deltas = (
        merged.groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("w"))
        .select(F.lit(batch_id).cast("long").alias("batch_id"), "*")
    )
    deltas.write.mode("append").parquet(out_path)
    # new tails: the batch's last event per user, stamped with this
    # batch_id (users absent from this batch keep their old rows —
    # latest-wins on read)
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
        .select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "user_id",
            "k",
            "ts",
            "event_id",
        )
    )
    lasts.write.mode("append").parquet(tail_path)


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
    StreamingQuery."""
    tail_path = f"{out_path.rstrip('/')}{TAIL_SUFFIX}"
    stream = spark.readStream.schema(schema).parquet(events_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_covisit_batch(
            spark, batch_df, batch_id, out_path, tail_path, item_json_path
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_covisit_tails(spark: SparkSession, tail_path: str) -> None:
    """Rewrite the tail table to one (latest) row per user — OFFLINE
    maintenance for the append-only history, which otherwise grows by
    one row per (batch, active user) and is window-scanned per batch.
    Must run only while the ingest stream is stopped: this overwrite
    can delete part files under an in-flight micro-batch read.
    Preserves each kept row's batch_id so replay visibility filters
    keep working after compaction."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        spark.read.parquet(tail_path)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=True)  # read fully before the overwrite
    )
    latest.write.mode("overwrite").parquet(tail_path)


def _latest_tails(tails: DataFrame) -> DataFrame:
    """Latest tail row per user — absorbs replay duplicates."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        tails.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "k")
    )
