"""Chunking and k-means clustering operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.operators.chunking import chunk_documents
from aws_ipl_data_pipeline_spark.operators.clustering import (
    assign_to_centroids,
    kmeans_fit,
    seed_centroids,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ chunking


@pytest.fixture(scope="module")
def chunked(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = chunk_documents(docs, chunk_tokens=16, overlap=4).cache()
    yield docs, out, 16, 4
    out.unpersist()


def test_chunks_cover_every_token_once_minus_overlap(spark, chunked):
    docs, out, chunk_tokens, overlap = chunked
    # stripping the first `overlap` tokens of every chunk after the
    # first and concatenating must rebuild the normalized document
    rebuilt = (
        out.withColumn(
            "part",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
                F.concat_ws(
                    " ", F.slice(F.split("chunk_text", " "), overlap + 1, chunk_tokens)
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "part"))),
                    lambda s: s["part"],
                ),
            ).alias("rebuilt")
        )
    )
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").alias("norm"),
    ).where(F.col("norm") != "")
    bad = (
        rebuilt.join(norm, "doc_id")
        .where(F.col("rebuilt") != F.col("norm"))
        .count()
    )
    assert bad == 0


def test_chunk_sizes_and_overlap_contract(spark, chunked):
    _, out, chunk_tokens, overlap = chunked
    stride = chunk_tokens - overlap
    rows = out.select(
        "doc_id",
        "chunk_id",
        "n_tokens",
        "chunk_n_tokens",
        F.size(F.split("chunk_text", " ")).alias("actual"),
    ).collect()
    assert rows
    for r in rows:
        start = r["chunk_id"] * stride
        expect = min(chunk_tokens, r["n_tokens"] - start)
        assert expect >= 1  # no empty chunks ever emitted
        assert r["chunk_n_tokens"] == expect
        assert r["actual"] == expect
    # chunk counts per doc match the ceil contract
    for d in out.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n"), F.count("*").alias("c")
    ).collect():
        assert d["c"] == math.ceil(max(d["n"] - overlap, 1) / stride)


def test_single_token_doc_yields_one_chunk(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hello"), Row(doc_id=2, text="   "), Row(doc_id=3, text="a b")]
    )
    got = {
        r["doc_id"]: (r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    assert got == {1: (0, "hello"), 3: (0, "a b")}  # whitespace-only doc dropped


# ----------------------------------------------------------------- clustering


def test_assignment_matches_numpy_brute_force(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = seed_centroids(emb, 4)
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_to_centroids(emb, cents).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    cids = sorted(cents)
    cmat = np.array([cents[c] for c in cids], dtype=np.float64)
    for r in rows:
        d2 = ((np.array(r["embedding"], dtype=np.float64) - cmat) ** 2).sum(axis=1)
        assert got[r["vec_id"]] == cids[int(np.argmin(d2))]


@pytest.mark.slow
def test_kmeans_converges_and_is_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a1, c1 = kmeans_fit(emb, k=4, max_iter=30)
    a2, c2 = kmeans_fit(emb, k=4, max_iter=30)
    assert c1.keys() == c2.keys()
    for cid in c1:
        assert c1[cid] == pytest.approx(c2[cid])
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    # every vector is assigned and cluster count is as requested
    assert a1.count() == emb.count()
    assert a1.select("centroid_id").distinct().count() <= 4


def test_kmeans_raises_when_not_converged(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(RuntimeError, match="did not converge"):
        kmeans_fit(emb, k=4, max_iter=0)


def test_kmeans_keeps_centroid_when_cluster_empties(spark):
    """A centroid that loses every member keeps its previous position
    instead of silently vanishing (k must never shrink mid-fit): two
    tight groups plus one far-away seed point — the far seed's cluster
    captures only itself; but a seed placed between the groups empties
    out as both groups pull toward their own seeds."""
    from pyspark.sql import Row

    # 4 points, k=3: seeds are the lowest-3 md5(id) draw; with ids 0..3
    # the geometry guarantees at least one seed converges onto the same
    # mean as another, leaving some cluster empty or near-empty — the
    # invariant under test is only |centroids| == k throughout.
    rows = [
        Row(vec_id=0, embedding=[0.0, 0.0]),
        Row(vec_id=1, embedding=[0.1, 0.0]),
        Row(vec_id=2, embedding=[0.05, 0.0]),
        Row(vec_id=3, embedding=[10.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows)
    assigned, cents = kmeans_fit(emb, k=3, max_iter=20)
    assert len(cents) == 3  # no silent shrink even if a cluster empties
    assert assigned.count() == 4


def test_pq_training_raises_on_sample_smaller_than_k(spark):
    """_train_books must refuse a sample with fewer rows than k rather
    than silently training a smaller codebook than callers' LUTs."""
    import numpy as np

    from aws_ipl_data_pipeline_spark.operators.pq import _train_books

    with pytest.raises(ValueError, match="rows < k"):
        _train_books(np.zeros((5, 8)), m=2, k=16, iters=2)


# ------------------------------------------------------------ temperature mix


def test_temperature_mix_keeps_rarest_source_whole(spark):
    from aws_ipl_data_pipeline_spark.operators.sampling import temperature_mix

    # mix on `lang`, the imbalanced stratum of the synthetic corpus
    # (`source` is uniform by construction, a no-op for rebalancing)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mixed = temperature_mix(docs, source_col="lang", alpha=0.5).cache()
    try:
        before = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        after = {r["lang"]: r["c"] for r in mixed.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        rarest = min(before, key=before.get)
        assert after[rarest] == before[rarest]  # keep_prob exactly 1.0
        # dominant sources shed rows; relative share moves toward uniform
        dominant = max(before, key=before.get)
        assert after[dominant] < before[dominant]
        assert (after[dominant] / after[rarest]) < (before[dominant] / before[rarest])
    finally:
        mixed.unpersist()


def test_temperature_mix_alpha_one_is_identity(spark):
    from aws_ipl_data_pipeline_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert temperature_mix(docs, alpha=1.0).count() == docs.count()


def test_token_budget_mix_respects_targets_and_determinism(spark):
    """Each source's admitted token mass never exceeds its √-share
    target, alpha<1 shifts share toward rare sources, and admission is
    a pure function of the data (rerun-identical)."""
    from aws_ipl_data_pipeline_spark.operators.dedup import normalized_text
    from aws_ipl_data_pipeline_spark.operators.sampling import token_budget_mix

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.size(F.split(normalized_text("text"), " ")).alias("n_tokens"),
        )
    )
    budget = 2000.0
    kept = token_budget_mix(docs, budget_tokens=budget, alpha=0.5).cache()
    try:
        per_src = {
            r["source"]: (r["tk"], r["tgt"])
            for r in kept.groupBy("source")
            .agg(
                F.sum("n_tokens").alias("tk"),
                F.any_value("target_tokens").alias("tgt"),
            )
            .collect()
        }
        assert per_src  # something was admitted
        for tk, tgt in per_src.values():
            assert tk <= tgt  # admit rule: running sum within target
        # √-temperature: every source's target is a positive share and
        # the shares sum to the budget
        assert sum(t for _, t in per_src.values()) <= budget + 1e-6
        rerun = token_budget_mix(docs, budget_tokens=budget, alpha=0.5)
        assert sorted(map(tuple, kept.drop("target_tokens").collect())) == sorted(
            map(tuple, rerun.drop("target_tokens").collect())
        )
    finally:
        kept.unpersist()


def test_temperature_mix_null_stratum_rows_survive(spark):
    """A NULL source is a legitimate stratum: the rates join is
    null-safe, so NULL-stratum rows are rebalanced like any other
    stratum instead of vanishing from the output."""
    from pyspark.sql import Row

    from aws_ipl_data_pipeline_spark.operators.sampling import temperature_mix

    rows = [Row(doc_id=i, source=("a" if i % 2 else None)) for i in range(40)]
    docs = spark.createDataFrame(rows)
    mixed = temperature_mix(docs, alpha=1.0)  # identity rates: all kept
    assert mixed.count() == 40
    assert mixed.where(F.col("source").isNull()).count() == 20


def test_chunking_runs_unchanged_on_a_stream(spark, tmp_path_factory):
    """chunk_documents is a stateless map — the exact same operator
    runs on a streaming frame in append mode (the corpus-ingest path
    can chunk on the way in, no batch/stream code fork)."""
    import json
    import os

    base = str(tmp_path_factory.mktemp("chunkstream"))
    src = f"{base}/src"
    os.makedirs(src)
    docs = [
        {"doc_id": 1, "text": "a b c d e f"},
        {"doc_id": 2, "text": "one two three"},
    ]
    with open(f"{src}/docs.json", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = (
        chunk_documents(stream, chunk_tokens=4, overlap=1)
        .writeStream.format("memory")
        .queryName("chunk_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        map(tuple, spark.table("chunk_stream").select("doc_id", "chunk_id", "chunk_text").collect())
    )
    batch = sorted(
        map(
            tuple,
            chunk_documents(
                spark.createDataFrame([(1, "a b c d e f"), (2, "one two three")], "doc_id long, text string"),
                chunk_tokens=4,
                overlap=1,
            ).select("doc_id", "chunk_id", "chunk_text").collect(),
        )
    )
    assert got == batch and len(got) > 2


# -------------------------------------------------------------- PQ ANN


def test_pq_codes_recall_and_determinism(spark):
    import numpy as np

    from aws_ipl_data_pipeline_spark.operators.pq import (
        encode_pq,
        pq_topk,
        pq_topk_rerank,
        train_pq_codebooks,
    )
    from aws_ipl_data_pipeline_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    unit = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / norm).alias("embedding"),
    )
    qraw = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    ]
    qn = (np.array(qraw) / np.linalg.norm(qraw)).tolist()

    books = train_pq_codebooks(unit, m=16, k=64)
    assert books == train_pq_codebooks(unit, m=16, k=64)  # deterministic
    codes = encode_pq(unit, books).cache()
    try:
        rng = codes.select(
            F.min(F.array_min("codes")), F.max(F.array_max("codes")), F.count("*")
        ).first()
        assert rng[0] >= 0 and rng[1] < 64 and rng[2] == emb.count()

        exact = {
            r["vec_id"]
            for r in brute_force_topk(emb, qraw, k=10, exclude_id=0).collect()
        }
        adc = {r["vec_id"] for r in pq_topk(codes, books, qn, k=10, exclude_id=0).collect()}
        # pure ADC on worst-case random gaussians: coarse but useful
        assert len(adc & exact) / 10 >= 0.3
        # the production path (ADC prune -> exact rerank) recovers the
        # exact top-k on this corpus
        rr = {
            r["vec_id"]
            for r in pq_topk_rerank(
                codes, emb, books, qn, k=10, overfetch=5, exclude_id=0
            ).collect()
        }
        assert len(rr & exact) / 10 >= 0.9
    finally:
        codes.unpersist()


def test_chunk_by_separator_contract(spark):
    from aws_ipl_data_pipeline_spark.operators.chunking import chunk_by_separator

    docs = spark.createDataFrame(
        [
            (1, "one two three. four five six seven. eight nine. ten"),
            (2, "single sentence only"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_by_separator(docs, budget=5).collect()
    }
    # doc 1: segs of 3, 4, 2, 1 tokens; running starts 0,3,7,9 ->
    # chunks floor(0/5)=0, 0, 1, 1
    assert got[(1, 0)]["chunk_text"] == "one two three. four five six seven"
    assert got[(1, 0)]["n_segments"] == 2 and got[(1, 0)]["chunk_n_tokens"] == 7
    assert got[(1, 1)]["chunk_text"] == "eight nine. ten"
    assert got[(1, 1)]["chunk_n_tokens"] == 3
    # boundaries never split a sentence
    assert got[(2, 0)]["chunk_text"] == "single sentence only"
    assert len(got) == 3


def test_ivfpq_monotone_recall_and_full_probe_exact(spark):
    import numpy as np

    from aws_ipl_data_pipeline_spark.operators.pq import (
        encode_ivfpq,
        ivfpq_topk_rerank,
        train_ivfpq,
    )
    from aws_ipl_data_pipeline_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    cents, books = train_ivfpq(emb, n_cells=16, m=16, k=64)
    assert (cents, books) == train_ivfpq(emb, n_cells=16, m=16, k=64)
    codes = encode_ivfpq(emb, cents, books).localCheckpoint(eager=True)
    assert codes.count() == emb.count()
    assert codes.select(F.countDistinct("cell")).first()[0] <= 16

    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10, exclude_id=0).collect()]
    recalls = []
    for n_probe in (4, 8, 16):
        got = {
            r["vec_id"]
            for r in ivfpq_topk_rerank(
                codes, emb, cents, books, q,
                k=10, n_probe=n_probe, overfetch=10, exclude_id=0,
            ).collect()
        }
        recalls.append(len(got & set(exact)) / 10)
    # recall grows with probes (random-gaussian corpus scatters true
    # neighbors uniformly across cells, so partial probes are coarse)
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # full probe degrades gracefully to exact
