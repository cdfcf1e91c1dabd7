"""Tests pinning curation_pipeline_e2e (VERDICT r11 item 4) to the
piecewise-registered stages it composes. The cross-engine funnel hash
is proven by the oracle replica; these pin what SQL can't see: the
inline chunk fold equals the chunk_documents operator, and the funnel
is a true filtration (each stage a subset of the previous)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.queries import (
    _CHUNK_OVERLAP,
    _CHUNK_STRIDE,
    _CHUNK_TOKENS,
    REGISTRY,
)

SF = "/root/testdata/sf0.001"


def test_curation_chunk_fold_matches_operator(spark):
    """The funnel's stage-6 numbers come from a per-row fold over the
    chunk contract instead of exploding chunks; prove fold == operator
    per document over the whole table."""
    from aws_ipl_data_pipeline_spark.operators.chunking import chunk_documents
    from aws_ipl_data_pipeline_spark.operators.dedup import normalized_text

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    via_op = (
        chunk_documents(
            docs, chunk_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("nc"),
            F.sum("chunk_n_tokens").alias("toks"),
        )
    )
    n = F.size(F.split(normalized_text("text"), " "))
    nc = (
        F.ceil(
            F.greatest(n - F.lit(_CHUNK_OVERLAP), F.lit(1))
            / F.lit(_CHUNK_STRIDE)
        )
    ).cast("long")
    fold = F.aggregate(
        F.sequence(F.lit(0).cast("long"), nc - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.least(
            F.lit(_CHUNK_TOKENS).cast("long"), n - i * F.lit(_CHUNK_STRIDE)
        ),
    )
    via_fold = docs.where(normalized_text("text") != "").select(
        "doc_id", nc.alias("nc"), fold.alias("toks")
    )
    diff = via_op.join(via_fold, "doc_id").where(
        (via_op["nc"] != via_fold["nc"]) | (via_op["toks"] != via_fold["toks"])
    )
    assert diff.count() == 0
    assert via_op.count() == via_fold.count()


def test_curation_funnel_is_a_filtration(spark):
    out = (
        REGISTRY["curation_pipeline_e2e"].fn(spark, SF).collect()
    )
    by_stage: dict[str, tuple[int, int]] = {}
    for r in out:
        nd, nt = by_stage.get(r["stage"], (0, 0))
        by_stage[r["stage"]] = (nd + r["n_docs"], nt + r["n_tokens"])
    stages = [
        "0_raw",
        "1_quality",
        "2_exact_dedup",
        "3_near_dedup",
        "4_decontaminated",
        "5_temperature_mix",
    ]
    assert set(by_stage) == set(stages) | {"6_chunks"}
    for a, b in zip(stages, stages[1:]):
        assert by_stage[b][0] <= by_stage[a][0], (a, b, by_stage)
        assert by_stage[b][1] <= by_stage[a][1], (a, b, by_stage)
    # every stage keeps something on this corpus (non-degenerate test)
    assert by_stage["5_temperature_mix"][0] > 0
    # chunking splits docs: at least one chunk per kept doc, total chunk
    # tokens >= kept doc tokens (overlap duplicates tokens)
    assert by_stage["6_chunks"][0] >= by_stage["5_temperature_mix"][0]
    assert by_stage["6_chunks"][1] >= by_stage["5_temperature_mix"][1]


def test_curation_plan_single_funnel_exchange(spark):
    """The seven-stage funnel aggregate (incl. chunk math) is ONE
    hash aggregation over the flags frame — the stack() unpivot and
    chunk fold must not introduce extra exchanges above it."""
    df = REGISTRY["curation_pipeline_e2e"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # the final agg exists and the unpivot rides above it without a
    # further exchange: no Exchange between Generate(stack) and the
    # last HashAggregate
    gen = plan.find("Generate stack")
    assert gen != -1
    nxt_agg = plan.find("HashAggregate", gen)
    nxt_exch = plan.find("Exchange", gen)
    assert nxt_agg != -1
    assert nxt_exch == -1 or nxt_agg < nxt_exch


def test_dedup_threshold_curve_monotone(spark):
    """The operating curve is non-increasing in the threshold (each
    threshold admits a subset of the previous one's pairs), covers the
    full grid via the spine, and varies on this corpus (the grid spans
    the background floor so the artifact is non-degenerate)."""
    rows = REGISTRY["dedup_threshold_curve"].fn(spark, SF).collect()
    ths = [r["threshold_1e4"] for r in rows]
    assert ths == sorted(ths) and len(ths) == 5
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_flagged"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert pairs[0] > pairs[-1] >= 0  # non-degenerate spread


def test_quality_score_curve_monotone(spark):
    """Quality-gate operating curve: non-increasing in the cutoff,
    full grid via the spine, non-degenerate spread on this corpus."""
    rows = REGISTRY["quality_score_curve"].fn(spark, SF).collect()
    ths = [r["threshold_1e2"] for r in rows]
    assert ths == sorted(ths) and len(ths) == 5
    docs = [r["n_docs"] for r in rows]
    chars = [r["n_chars_kept"] for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert chars == sorted(chars, reverse=True)
    assert docs[0] > docs[-1] >= 0


def test_curation_incremental_is_a_filtration(spark):
    """Incremental admission funnel: per-source stage counts are
    non-increasing, only batch docs appear, and the near-dup stage vs
    the corpus state actually removes something at this sf (the
    synthetic near-dups straddle the %10 split)."""
    out = REGISTRY["curation_incremental"].fn(spark, SF).collect()
    by_stage: dict[str, int] = {}
    for r in out:
        by_stage[r["stage"]] = by_stage.get(r["stage"], 0) + r["n_docs"]
    stages = ["0_batch", "1_quality", "2_exact_novel", "3_near_novel"]
    assert set(by_stage) == set(stages)
    for a, b in zip(stages, stages[1:]):
        assert by_stage[b] <= by_stage[a], by_stage
    assert by_stage["3_near_novel"] > 0
    assert by_stage["3_near_novel"] < by_stage["0_batch"]
