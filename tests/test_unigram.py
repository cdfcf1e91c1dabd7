"""Unit tests for the unigram-LM tokenizer trainer + apply path
(operators/unigram.py — VERDICT r11 item 3). The cross-engine hash
proof lives in the oracle replica (test_queries_oracle / driver); these
pin the pieces an oracle can't: the composition-table contract, the
integer log, apply semantics incl. the long-word rule, determinism,
and the no-Python-in-the-loop plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.operators.unigram import (
    KEEP_SCHEDULE,
    MAX_PIECE_LEN,
    MAX_WORD_LEN,
    MISSING_SCORE,
    best_segmentation,
    compositions,
    qlog2,
    unigram_token_count,
    unigram_train,
)


def test_compositions_counts_and_order():
    cs = compositions()
    # tetranacci: compositions of n into parts 1..4
    assert [len(cs[n]) for n in range(1, MAX_WORD_LEN + 1)] == [
        1, 2, 4, 8, 15, 29, 56, 108,
    ]
    for n, comps in cs.items():
        lens_seqs = [[ln for _, ln in comp] for comp in comps]
        # every composition tiles the word exactly, pieces within bounds
        for comp, lens in zip(comps, lens_seqs):
            assert sum(lens) == n
            assert all(1 <= ln <= MAX_PIECE_LEN for ln in lens)
            starts = [s for s, _ in comp]
            assert starts[0] == 1
            for (s0, l0), (s1, _) in zip(comp, comp[1:]):
                assert s1 == s0 + l0
        # the index-as-tie-break contract: lexicographic by length seq
        assert lens_seqs == sorted(lens_seqs)
        assert len(set(map(tuple, lens_seqs))) == len(lens_seqs)


def test_qlog2_integer_fixed_point():
    # exact at powers of two, monotone, within 0.09 bits of true log2
    for e in range(0, 40):
        assert qlog2(1 << e) == e << 16
    prev = -1
    for c in [1, 2, 3, 5, 7, 100, 255, 256, 257, 10**6, 10**12]:
        q = qlog2(c)
        assert q > prev or c == 1
        assert abs(q / 65536 - math.log2(c)) < 0.09
        prev = q
    # pure-integer definition (the SQL twin's contract)
    for c in [3, 100, 999999]:
        msb = c.bit_length() - 1
        assert qlog2(c) == (msb << 16) + (c << 16 >> msb) - (1 << 16)


def test_apply_prefers_learned_pieces(spark):
    scores = {"a": -10, "b": -12, "ab": -8, "cd": -9, "c": -11, "d": -11}
    df = spark.createDataFrame(
        [("abab",), ("abcd",), ("a",), ("ba",)], "word string"
    )
    out = {
        r["word"]: r["n"]
        for r in df.select(
            "word", unigram_token_count("word", scores).alias("n")
        ).collect()
    }
    # 'ab'+'ab' (=-16) beats any char split (>= -40)
    assert out["abab"] == 2
    assert out["abcd"] == 2  # 'ab'+'cd'
    assert out["a"] == 1
    assert out["ba"] == 2  # no 'ba' piece -> chars


def test_apply_long_word_rule(spark):
    # > MAX_WORD_LEN: best segmentation of the 8-char prefix + one
    # char-piece per remaining character
    scores = {c: -10 for c in "abcdefghij"}
    scores["abcd"] = -5
    df = spark.createDataFrame([("abcdefghij",)], "word string")
    n = df.select(unigram_token_count("word", scores).alias("n")).collect()[0][
        "n"
    ]
    # prefix 'abcdefgh' -> 'abcd'+4 chars = 5 tokens, tail 'ij' -> +2
    assert n == 7


def test_best_segmentation_tie_breaks_to_lowest_comp_idx(spark):
    # two segmentations with identical scores: ('ab','cd') is comp
    # lens [2,2]; ('a','bcd') is [1,3]. [1,3] < [2,2] lexicographically
    # so it has the LOWER index and must win the tie.
    scores = {"a": -10, "bcd": -10, "ab": -10, "cd": -10}
    df = spark.createDataFrame([("abcd",)], "word string")
    best = df.select(
        best_segmentation("word", scores).alias("b")
    ).collect()[0]["b"]
    assert best["sc"] == -20
    assert list(best["ls"]) == [1, 3]


def test_missing_pieces_never_win(spark):
    # a word with a char outside the vocab: every segmentation is
    # invalid; the argmax still returns (score <= MISSING_SCORE), the
    # trainer never feeds such words (chars are always seeded)
    scores = {"a": -1}
    df = spark.createDataFrame([("az",)], "word string")
    best = df.select(
        best_segmentation("word", scores).alias("b")
    ).collect()[0]["b"]
    assert best["sc"] <= MISSING_SCORE + 100


def test_trainer_deterministic_and_bounded(spark):
    rows = [
        ("the cat sat on the mat the cat sat",),
        ("a cat and a mat and a hat",),
        ("the hat on the cat on the mat",),
    ] * 3
    docs = spark.createDataFrame(rows, "text string")
    w = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    v1 = unigram_train(w)
    v2 = unigram_train(w)
    assert v1 == v2  # pure function of the data
    pieces = {p for p, _, _ in v1}
    chars = {c for (r,) in rows for c in r.replace(" ", "")}
    assert chars <= pieces  # character coverage guarantee
    multis = [p for p in pieces if len(p) > 1]
    assert 0 < len(multis) <= KEEP_SCHEDULE[-1]
    # ranked by (usage DESC, piece ASC)
    key = [(-u, p) for p, u, _ in v1]
    assert key == sorted(key)
    # scores are negative integer log-probs, usage positive
    assert all(u >= 1 and s < 0 for _, u, s in v1)


def test_apply_plan_stays_jvm_side(spark):
    scores = {"a": -10, "b": -12, "ab": -8}
    df = spark.createDataFrame([("abab",)], "word string")
    plan = df.select(
        unigram_token_count("word", scores).alias("n")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python UDF in the hot path


def test_apply_fallback_on_unseen_alphabet(spark):
    # 'z' is outside the vocab: no fully-in-vocab segmentation exists
    # for 'az', so the apply path falls back to one token per prefix
    # char (the oracle's COALESCE rule)
    scores = {"a": -1}
    df = spark.createDataFrame([("az",), ("a",), ("azzzzzzzzzz",)], "word string")
    out = {
        r["word"]: r["n"]
        for r in df.select(
            "word", unigram_token_count("word", scores).alias("n")
        ).collect()
    }
    assert out["az"] == 2  # fallback: 2 prefix chars
    assert out["a"] == 1  # valid single piece
    # 11 chars: 8-char invalid prefix falls back to 8 + 3 tail chars
    assert out["azzzzzzzzzz"] == 11
