"""Document chunking for training-data pipelines.

Splits long documents into overlapping token windows — the step between
cleaning/dedup and sequence packing when documents exceed the model
context. (The reference pipeline has no analogue; this extends the
engine per the LLM-data-pipeline charter, alongside operators/packing.)

Scale shape: pure column expressions (split / sequence / explode /
slice), no Python per row and no shuffle — chunking is map-only, so it
pipelines into whatever partitioning the downstream pack/write wants.
Row growth is bounded by ceil(n_tokens / stride) per document; at 100 TB
the explode happens after column pruning, so only (id, tokens) widths
flow, never unrelated payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.operators.dedup import normalized_text


def chunk_by_separator(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 64,
    sep: str = r"\. ",
    joiner: str = ". ",
) -> DataFrame:
    """Semantic chunking: split on a separator (default: sentence
    boundaries), then assign each segment to the chunk its running
    token total STARTS in (the same contract as sequence packing) and
    reassemble. Unlike the fixed-window ``chunk_documents``, boundaries
    never fall mid-sentence; a chunk may exceed ``budget`` only by the
    tail of its last segment.

    Plan shape: segment explode is map-side; the running total is one
    window partitioned by the document key — a single shuffle on
    ``id_col``, no global window; reassembly is a groupBy on the same
    key (same partitioning → no second Exchange).

    Output: (doc_id, chunk_id, chunk_text, n_segments, chunk_n_tokens).
    """
    norm = normalized_text(text_col)
    segs = (
        docs.where(norm != "")
        .select(
            F.col(id_col).cast("long").alias(id_col),
            F.posexplode(F.split(norm, sep)).alias("_pos", "_seg"),
        )
        .where(F.col("_seg") != "")
    )
    seg_tokens = F.size(F.split(F.col("_seg"), " "))
    w = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = segs.withColumn("_n", seg_tokens).withColumn(
        "chunk_id",
        F.floor((F.sum("_n").over(w) - F.col("_n")) / budget).cast("long"),
    )
    return (
        assigned.groupBy(id_col, "chunk_id")
        .agg(
            F.concat_ws(
                joiner,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_seg"))),
                    lambda s: s["_seg"],
                ),
            ).alias("chunk_text"),
            F.count("*").cast("long").alias("n_segments"),
            F.sum("_n").cast("long").alias("chunk_n_tokens"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Sliding token windows of ``chunk_tokens`` with ``overlap`` tokens
    shared between consecutive chunks (stride = chunk_tokens - overlap).

    Contract (mirrors the SQL oracle exactly):
    * tokens = whitespace split of the canonical normalized text;
    * documents whose normalized text is empty yield no chunks;
    * n_chunks = ceil(max(n_tokens - overlap, 1) / stride) — every token
      lands in ≥1 chunk and the final chunk may be short;
    * chunk i covers tokens [i*stride, i*stride + chunk_tokens).

    Output: (doc_id, chunk_id, chunk_text, chunk_n_tokens, n_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    norm = normalized_text(text_col)
    toks = F.split(norm, " ")
    n = F.size(toks)
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride))
    start = F.col("chunk_id") * stride  # 0-based token offset
    return (
        docs.where(norm != "")
        .select(
            F.col(id_col).cast("long").alias(id_col),
            toks.alias("_toks"),
            n.cast("long").alias("n_tokens"),
            n_chunks.cast("long").alias("_nc"),
        )
        .select(
            id_col,
            "_toks",
            "n_tokens",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("_toks"), start + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens).cast("long"), F.col("n_tokens") - start)
            .alias("chunk_n_tokens"),
            "n_tokens",
        )
    )
