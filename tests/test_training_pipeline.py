"""End-to-end training-data pipeline: streaming ingest (dedupe +
quality gate) → chunk → sharded pack → sorted write. Composes the real
operators a corpus run would chain; asserts the invariants that must
survive the composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.operators.chunking import chunk_documents
from aws_ipl_data_pipeline_spark.operators.packing import pack_sequences
from aws_ipl_data_pipeline_spark.sources.maintenance import write_sorted
from aws_ipl_data_pipeline_spark.streaming.corpus import run_corpus_ingest

CHUNK_TOKENS, OVERLAP, BUDGET = 8, 2, 16


def test_ingest_chunk_pack_write_end_to_end(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("e2e"))
    docs_dir = f"{base}/drop"
    schema = "doc_id long, text string"

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different content lives in this document body"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
        (4, "   "),  # quality-gated
        (5, "short doc"),
    ]
    spark.createDataFrame(docs, schema).write.parquet(f"{docs_dir}/f1.parquet")

    # 1. streaming ingest: exact-dedupe + quality gate
    run_corpus_ingest(
        spark,
        docs_dir=f"{docs_dir}/*",
        out_path=f"{base}/admitted",
        checkpoint_dir=f"{base}/ckpt",
        schema=spark.createDataFrame(docs, schema).schema,
        min_chars=1,
    ).awaitTermination(300)
    admitted = spark.read.parquet(f"{base}/admitted")
    admitted_ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}
    assert admitted_ids == {1, 2, 5}  # dup 3 rejected, empty 4 gated

    # 2. chunk
    chunks = chunk_documents(
        admitted, chunk_tokens=CHUNK_TOKENS, overlap=OVERLAP
    ).withColumn("chunk_uid", F.col("doc_id") * 1048576 + F.col("chunk_id"))
    n_chunks = chunks.count()
    assert n_chunks > len(admitted_ids)  # doc 1 is long enough to split

    # 3. sharded pack on the chunk token counts
    packed = pack_sequences(
        chunks.withColumn("shard", F.pmod("doc_id", F.lit(2)).cast("string")),
        budget=BUDGET,
        id_col="chunk_uid",
        tokens_col="chunk_n_tokens",
        shard_col="shard",
    )
    assert packed.count() == n_chunks  # packing reassigns, never drops
    assert packed.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= BUDGET)
    ).count() == 0
    # a chunk never spans past where the next one in its pack starts
    assert packed.where(F.col("chunk_n_tokens") > BUDGET).count() == 0

    # 4. sorted write for data skipping on the pack id
    write_sorted(packed, f"{base}/packed", by=["pack_id"])
    back = spark.read.parquet(f"{base}/packed")
    assert back.count() == n_chunks
    # every admitted doc's full token stream survives to the final table
    toks_in = (
        admitted.select(
            F.size(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    stride = CHUNK_TOKENS - OVERLAP
    toks_out = (
        back.withColumn(
            "novel",
            F.when(F.col("chunk_id") == 0, F.col("chunk_n_tokens")).otherwise(
                F.col("chunk_n_tokens") - OVERLAP
            ),
        )
        .agg(F.sum("novel"))
        .first()[0]
    )
    assert toks_out == toks_in


def test_shuffle_shards_deterministic_and_complete(spark):
    """Epoch shuffle: every row lands in exactly one (shard, position)
    slot, positions are contiguous from 1 within each shard, reruns
    reproduce the identical permutation, and a different epoch yields a
    different order (new salt) over the same complete id set."""
    from aws_ipl_data_pipeline_spark.operators.sampling import shuffle_shards

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(docs, n_shards=8, epoch=0).collect()
    assert len(out) == 500
    assert {r["doc_id"] for r in out} == set(range(500))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic rerun
    out2 = shuffle_shards(docs, n_shards=8, epoch=0).collect()
    assert {(r["doc_id"], r["shard"], r["position"]) for r in out} == {
        (r["doc_id"], r["shard"], r["position"]) for r in out2
    }
    # epoch bump: same ids, different permutation
    out_e1 = shuffle_shards(docs, n_shards=8, epoch=1).collect()
    assert {r["doc_id"] for r in out_e1} == set(range(500))
    assert {(r["doc_id"], r["shard"], r["position"]) for r in out_e1} != {
        (r["doc_id"], r["shard"], r["position"]) for r in out
    }
