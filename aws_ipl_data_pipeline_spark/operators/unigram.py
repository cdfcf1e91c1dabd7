"""Unigram-LM (SentencePiece-style) tokenizer trainer — the second
tokenizer-training family beside BPE (operators/text.bpe_train_merges):
real pipelines choose between merge-based (BPE) and likelihood-based
(unigram) vocabularies, so the engine carries both (VERDICT r11
item 3). The reference trains no tokenizer; this is an LLM-pipeline
extension with no reference counterpart.

The trainer is Viterbi-EM over a vocab-bounded candidate table, in the
``kmeans_fit_fixed_int`` / ``bpe_train_merges`` cross-engine-exact
discipline:

* FIXED round count, no convergence check — the result is a pure
  function of (data, constants);
* every score is an INTEGER: piece log-probabilities are fixed-point
  base-2 logs (``qlog2``: msb·2^F + mantissa-interpolation, pure
  integer shifts — bit-identical in Python, Spark SQL, and DuckDB, no
  libm call anywhere), so Viterbi comparisons and EM counts can never
  diverge in the last ulp across engines or shuffle orders;
* all driver collects are BOUNDED: the seeded character set (corpus
  alphabet, ≤ ~50 for normalized text), the top-``seed_multi``
  substring candidates, and one ≤|vocab|-row usage frame per round —
  the k-centroid budget, never a corpus collect;
* the corpus pays ONE scan (the word-frequency aggregate, which the
  trainer localCheckpoints); every EM round rescans only word TYPES
  weighted by tf — how distributed tokenizer trainers actually scale.

Segmentation search: words are scored over ALL compositions of their
length into pieces of ≤ ``MAX_PIECE_LEN`` chars — a FIXED combinatorial
object per word length (108 compositions at length 8), shared with the
SQL oracle as generated constants (the graph-constants pattern), so
both engines enumerate the identical candidate set instead of
replicating a DP loop. The Viterbi argmax is ``array_max`` over
(total_score, -composition_index) structs: max total score, ties to the
LOWEST composition index — the oracle's ``ORDER BY sc DESC, cidx ASC``
row_number, bit-for-bit. Per-word scoring is pure JVM codegen (nested
higher-order functions over literal composition tables and a literal
score map): the E-step's only exchange is the piece-usage aggregate.

Training considers word types of length ≤ ``MAX_WORD_LEN`` (the
SentencePiece max-piece/seed-filter analogue; longer types — rare in
normalized text — are excluded from TRAINING, while the apply path
tokenizes any length by scoring its ≤MAX_WORD_LEN prefix and
char-counting the tail). Single characters are mandatory vocabulary
(never pruned, add-one usage floor when unused — SentencePiece's
character coverage guarantee), so every training word always has at
least one valid segmentation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_WORD_LEN = 8
MAX_PIECE_LEN = 4
SEED_MULTI = 32  # multi-char candidates seeded into the round-0 vocab
# per-round multi-char keep counts — SentencePiece's shrink schedule,
# fixed so the replica is a pure function of the data
KEEP_SCHEDULE = (24, 16)
QLOG_FRAC_BITS = 16
# a fully-missing piece: worse than any sum of valid scores (a valid
# piece scores >= -qlog2(total) >= -(47<<16) ~= -3.1e6; 8 of them
# ~= -2.5e7 >> -2^40), so an invalid segmentation can never win
# against the always-valid all-chars one.
MISSING_SCORE = -(1 << 40)


def qlog2(c: int, frac_bits: int = QLOG_FRAC_BITS) -> int:
    """Fixed-point base-2 log of a POSITIVE integer: msb·2^F plus the
    linearly-interpolated mantissa — floor(c·2^F / 2^msb) - 2^F. Pure
    integer shifts, exact and identical in Python, Spark, and DuckDB
    (the SQL form uses length(bin(c))-1 for the msb); max error vs
    true log2 is ~0.086 bits, irrelevant for ranking — determinism is
    the contract, not calibration."""
    if c <= 0:
        raise ValueError(f"qlog2 needs a positive count, got {c}")
    msb = c.bit_length() - 1
    return (msb << frac_bits) + (c << frac_bits >> msb) - (1 << frac_bits)


def qlog2_sql(expr: str, frac_bits: int = QLOG_FRAC_BITS) -> str:
    """The DuckDB twin of ``qlog2`` — generated text so the two
    engines share ONE definition (bin() is unpadded in both)."""
    e = f"CAST({expr} AS BIGINT)"
    one = 1 << frac_bits
    return (
        f"((length(bin({e})) - 1) * {one} + ({e} * {one}) "
        f"// (CAST(1 AS BIGINT) << (length(bin({e})) - 1)) - {one})"
    )


def compositions(
    max_len: int = MAX_WORD_LEN, max_piece: int = MAX_PIECE_LEN
) -> dict[int, list[list[tuple[int, int]]]]:
    """All compositions of n (1..max_len) into parts of 1..max_piece,
    as (start, length) pairs with 1-based starts, in lexicographic
    order of the length sequence — the composition INDEX within a
    length's list is the cross-engine tie-break key, so this order is
    part of the trainer's contract. 1+2+4+8+15+29+56+108 = 223
    compositions at the defaults."""
    out: dict[int, list[list[tuple[int, int]]]] = {}

    def _gen(n: int) -> list[list[int]]:
        if n == 0:
            return [[]]
        res = []
        for first in range(1, min(max_piece, n) + 1):
            for rest in _gen(n - first):
                res.append([first] + rest)
        return res

    for n in range(1, max_len + 1):
        comps = []
        for lens in _gen(n):
            start, pieces = 1, []
            for ln in lens:
                pieces.append((start, ln))
                start += ln
            comps.append(pieces)
        out[n] = comps
    return out


def _comps_literal() -> Column:
    """The composition table as ONE nested literal column:
    array (indexed by word length 1..MAX_WORD_LEN) of
    array<struct<idx:int, ss:array<int>, ls:array<int>>>. Literal, so
    per-word segmentation scoring is whole-stage-codegen — no join,
    no shuffle, no UDF.

    Built as ONE parsed SQL expression: the per-element Column form
    (223 structs of F.lit calls) cost ~5 s of py4j round-trips per
    DataFrame BUILD — measured r12 as the whole of
    unigram_trained_compression's apparent runtime (execution was
    0.4 s). Identical literal values, one JVM call."""
    by_len = compositions()
    arrays = []
    for n in range(1, MAX_WORD_LEN + 1):
        structs = ",".join(
            "named_struct('idx',{idx},'ss',array({ss}),'ls',array({ls}))".format(
                idx=idx,
                ss=",".join(str(s) for s, _ in comp),
                ls=",".join(str(ln) for _, ln in comp),
            )
            for idx, comp in enumerate(by_len[n])
        )
        arrays.append(f"array({structs})")
    return F.expr(f"array({','.join(arrays)})")


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal (quote/backslash escaped)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _score_map_literal(scores: dict[str, int]) -> Column:
    """piece -> integer score as a literal map (|vocab| <= ~70
    entries), sorted for a deterministic expression; one parsed SQL
    expression for the same py4j reason as _comps_literal."""
    args = ",".join(
        f"{_sql_str(piece)},{int(scores[piece])}L" for piece in sorted(scores)
    )
    return F.expr(f"map({args})")


def best_segmentation(word_col: str, scores: dict[str, int]) -> Column:
    """Viterbi argmax over the composition table for a word of length
    1..MAX_WORD_LEN: struct(sc, negidx, ss, ls) of the best-scoring
    segmentation under ``scores`` (missing pieces take MISSING_SCORE,
    so only fully-in-vocab segmentations can win). Ties break to the
    lowest composition index — the oracle's ORDER BY sc DESC, cidx
    ASC. Pure column expression."""
    return best_segmentation_of(F.col(word_col), scores)


def unigram_token_count(word_col: str, scores: dict[str, int]) -> Column:
    """APPLY path: token count of a word under a trained unigram
    vocabulary — the Viterbi segmentation's piece count. Words longer
    than MAX_WORD_LEN tokenize as the best segmentation of the
    MAX_WORD_LEN-char prefix plus one char-piece per remaining
    character (the documented long-tail rule; such types are excluded
    from training). A prefix with NO fully-in-vocab segmentation (a
    character outside the trained alphabet — impossible for training
    words, possible at apply time on unseen text) falls back to one
    token per prefix character, the SQL oracle's COALESCE rule. Pure
    column expression — vocab-bounded literals, zero Python in the
    loop."""
    w = F.col(word_col)
    prefix = F.substring(w, 1, MAX_WORD_LEN)
    prefix_best = best_segmentation_of(prefix, scores)
    # any fully-valid segmentation scores > -2^39 (>= MAX_WORD_LEN
    # pieces at >= -qlog2(total) each, a few 1e7 at most); any invalid
    # one carries at least one MISSING_SCORE = -2^40 term
    valid = prefix_best["sc"] > F.lit(-(1 << 39)).cast("long")
    prefix_toks = F.when(valid, F.size(prefix_best["ss"])).otherwise(
        F.length(prefix)
    )
    return (
        prefix_toks + F.greatest(F.length(w) - F.lit(MAX_WORD_LEN), F.lit(0))
    ).cast("long")


def best_segmentation_of(word_expr: Column, scores: dict[str, int]) -> Column:
    """``best_segmentation`` over an arbitrary string EXPRESSION (the
    apply path truncates first; training words are pre-filtered)."""
    score_map = _score_map_literal(scores)
    cands = F.element_at(_comps_literal(), F.length(word_expr))
    scored = F.transform(
        cands,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    c["ss"], c["ls"], lambda s, ln: word_expr.substr(s, ln)
                ),
                F.lit(0).cast("long"),
                lambda acc, p: acc
                + F.coalesce(
                    F.try_element_at(score_map, p),
                    F.lit(MISSING_SCORE).cast("long"),
                ),
            ).alias("sc"),
            (-c["idx"]).alias("negidx"),
            c["ss"].alias("ss"),
            c["ls"].alias("ls"),
        ),
    )
    return F.array_max(scored)


def _rescore(usage: dict[str, int]) -> dict[str, int]:
    """M-step: integer scores qlog2(cnt) - qlog2(total) over the kept
    vocabulary (renormalized over kept usage, char floors included)."""
    total = sum(usage.values())
    qt = qlog2(total)
    return {p: qlog2(c) - qt for p, c in usage.items()}


def unigram_train(
    words: DataFrame,
    rounds: int = len(KEEP_SCHEDULE),
    word_col: str = "word",
    tf_col: str = "tf",
) -> list[tuple[str, int, int]]:
    """Train the unigram vocabulary: seed (all corpus chars + top
    SEED_MULTI substrings by tf-weighted count), then ``rounds``
    Viterbi-EM rounds — E-step: per-word best segmentation under the
    current integer scores (map-only codegen; ONE piece-usage exchange);
    M-step: re-count, floor unused chars at 1, prune multis to
    KEEP_SCHEDULE[r] by (usage DESC, piece ASC), rescore. Returns the
    final vocabulary as [(piece, n_uses, score_q)] ranked by
    (n_uses DESC, piece ASC) — replayed bit-identically by the
    unrolled-CTE oracle in queries.py."""
    if rounds > len(KEEP_SCHEDULE):
        raise ValueError(
            f"rounds={rounds} exceeds the fixed KEEP_SCHEDULE "
            f"({len(KEEP_SCHEDULE)} rounds) the oracle replays"
        )
    w = (
        words.where(
            (F.length(word_col) >= 1) & (F.length(word_col) <= MAX_WORD_LEN)
        )
        .select(
            F.col(word_col).alias("word"), F.col(tf_col).cast("long").alias("tf")
        )
        .localCheckpoint(eager=True)  # one corpus-derived scan, reused per round
    )

    # ---- round-0 seeding (two bounded collects) ----
    chars = {
        r["piece"]: int(r["cnt"])
        for r in (
            w.select(
                F.explode(F.split("word", "")).alias("piece"), "tf"
            )
            .where(F.col("piece") != "")
            .groupBy("piece")
            .agg(F.sum("tf").alias("cnt"))
            .collect()  # bounded: the corpus alphabet
        )
    }
    multi_pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.transform(
                F.sequence(
                    F.lit(2),
                    F.least(F.lit(MAX_PIECE_LEN), F.length("word") - i + 1),
                ),
                lambda ln: F.struct(i.alias("i"), ln.alias("l")),
            ),
        )
    )
    multis = {
        r["piece"]: int(r["cnt"])
        for r in (
            w.where(F.length("word") >= 2)  # sequence(1, 0) would DESCEND
            .select("word", "tf", F.explode(multi_pairs).alias("p"))
            .select(
                F.col("word").substr(
                    F.col("p.i"), F.col("p.l")
                ).alias("piece"),
                "tf",
            )
            .groupBy("piece")
            .agg(F.sum("tf").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(SEED_MULTI)
            .collect()  # bounded: SEED_MULTI rows
        )
    }
    usage = {**chars, **multis}
    scores = _rescore(usage)

    # ---- EM rounds ----
    for r in range(rounds):
        best = best_segmentation("word", scores)
        used = (
            w.select(
                "tf",
                F.explode(
                    F.zip_with(
                        best["ss"],
                        best["ls"],
                        lambda s, ln: F.col("word").substr(s, ln),
                    )
                ).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("tf").alias("cnt"))
            .collect()  # bounded: <= |vocab| rows (winners are in-vocab)
        )
        counts = {row["piece"]: int(row["cnt"]) for row in used}
        keep = KEEP_SCHEDULE[r]
        kept_multis = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep]
        usage = {p: counts.get(p, 1) for p in chars}  # add-one char floor
        usage.update(dict(kept_multis))
        scores = _rescore(usage)

    return sorted(
        ((p, usage[p], scores[p]) for p in usage),
        key=lambda x: (-x[1], x[0]),
    )
