"""Text-analysis operators over a documents table.

All pure column expressions (codegen'd, shuffle only where grouped) —
the 100 TB design constraint is simply "no Python per row".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.operators.dedup import normalized_text

# tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. (The synthetic corpus is English-vocab word
# salad for every lang label, so on testdata the classifier's value is
# exercising the operator shape, not recovering the label.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "fr": ["le", "la", "les", "des", "une", "est", "et"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish token heuristic: word pieces = runs of letters, digits, or a
# single non-space symbol (approximates subword splits on punctuation).
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# PII patterns shared by the Spark and oracle sides (RE2/Java-compatible
# subset: no backrefs or lookaround).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def tokens(text_col: Column | str = "text") -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(normalized_text(text_col), " ")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + chars."""
    t = tokens(text_col)
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).cast("long"),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.length(c).cast("long").alias("n_chars_computed"),
        F.round(F.length(c) / F.greatest(F.size(t), F.lit(1)), 4).alias(
            "avg_token_len"
        ),
    )


def quality_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quality scoring: length / punctuation ratio / stopword ratio.

    quality = 1 if (20 ≤ tokens ≤ 10000) ∧ punct_ratio < 0.2 ∧
    stopword_ratio ≥ 0.01 — a C4-style heuristic gate.

    ``keep_cols`` carries extra source columns through the projection
    (r13, guide §2.4): composite pipelines previously re-scanned the
    table and joined the scores back on ``id_col`` — a second scan plus
    a join exchange for columns that were sitting in the same row."""
    t = tokens(text_col)
    n_tok = F.size(t)
    punct = F.length(F.regexp_replace(text_col, r"[^.!?,;:]", ""))
    n_stop = F.size(
        F.filter(t, lambda x: x.isin(STOPWORDS))
    )
    out = docs.select(
        F.col(id_col).cast("long"),
        *[F.col(c) for c in keep_cols],
        n_tok.cast("long").alias("n_tokens"),
        F.round(punct / F.greatest(F.length(text_col), F.lit(1)), 4).alias(
            "punct_ratio"
        ),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
    )
    return out.withColumn(
        "quality_pass",
        (
            (F.col("n_tokens") >= 20)
            & (F.col("n_tokens") <= 10000)
            & (F.col("punct_ratio") < 0.2)
            & (F.col("stopword_ratio") >= 0.01)
        ).cast("long"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: CJK-character detection, then stopword
    marker voting with deterministic ties (marker count desc, then
    language code asc); no markers at all → 'und'."""
    t = tokens(text_col)
    scores = {
        lang: F.size(F.filter(t, lambda x: x.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse-alphabetical order so the final expression
    # prefers the alphabetically-first language on score ties
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        take = s >= F.greatest(best_score, F.lit(1))
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return docs.select(
        F.col(id_col).cast("long"),
        F.when(has_cjk, F.lit("zh")).otherwise(best).alias("predicted_lang"),
    )


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition metrics: duplicate-token ratio plus the
    mass fraction of the most frequent token and bigram.

    Token/bigram top counts go through explode → groupBy (map-side
    partial aggregation keyed by doc_id, two narrow shuffles) rather
    than higher-order array folds — the per-row fold is interpreted,
    the exploded hash-agg is whole-stage codegen'd.

    r12: two fused one-pass forms were MEASURED and rejected — a
    struct-keyed (kind, hash) explode built by transform lambdas
    (interleaved A/B best 1.14 vs 0.93 s: the per-element HOF tax
    exceeds the saved exchange + join) and an index-explode + stack(2)
    all-codegen form (1.04 vs 0.99 s: a wash). The two-chain shape
    below stays."""
    tk = tokens(text_col)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), tk.alias("tk"))
    stats = base.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("long").alias("n_distinct_tokens"),
    )
    # Spark array indexing in SQL exprs is 0-based: i in 2..n -> (i-2, i-1).
    # Guard n<2: sequence(2, 1) counts DOWN in Spark, which would index
    # out of bounds on single-token docs.
    # count keys are 64-bit hashes, not the strings themselves: the
    # two (doc_id, key) shuffles move fixed 8-byte keys (collision odds
    # the accepted digest class; a collision could only merge two
    # counts within one doc)
    bigrams = F.expr(
        "IF(size(tk) < 2, CAST(array() AS array<bigint>), "
        "transform(sequence(2, size(tk)), i -> xxhash64(tk[i-2], tk[i-1])))"
    )
    top_tok = (
        base.select("doc_id", F.explode("tk").alias("tok"))
        .groupBy("doc_id", F.xxhash64("tok").alias("_ht"))
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_tok"))
    )
    top_bg = (
        base.select("doc_id", F.explode(bigrams).alias("_hb"))
        .groupBy("doc_id", "_hb")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bg"))
    )
    n = F.col("n_tokens")
    return (
        stats.join(top_tok, "doc_id", "left")
        .join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            F.round(
                1 - F.col("n_distinct_tokens") / F.greatest(n, F.lit(1)), 4
            ).alias("dup_token_ratio"),
            F.round(
                F.coalesce(F.col("top_tok"), F.lit(0)) / F.greatest(n, F.lit(1)), 4
            ).alias("top_token_frac"),
            F.round(
                F.coalesce(F.col("top_bg"), F.lit(0))
                / F.greatest(n - 1, F.lit(1)),
                4,
            ).alias("top_bigram_frac"),
        )
    )


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing: count and redact email / phone patterns.

    Pure regexp column expressions (codegen'd); emits the redacted
    text's md5 + length so equality of the full redaction is checkable
    without shipping the text."""
    c = F.col(text_col)
    emails = F.regexp_count(c, F.lit(EMAIL_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        emails.cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
    )


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document fingerprinting: md5 of normalized text plus a 64-bit
    rolling-style content hash (xxhash64 of the token stream)."""
    return docs.select(
        F.col(id_col).cast("long"),
        F.md5(normalized_text(text_col)).alias("fingerprint_md5"),
        F.xxhash64(F.concat_ws(" ", tokens(text_col))).cast("long").alias(
            "fingerprint_x64"
        ),
    )


def quality_classifier_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: tuple[float, float, float, float, float] = (0.35, 2.0, -3.0, -0.15, 1.2),
    bias: float = -1.0,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Linear quality-classifier scoring — the fastText/DCLM-style
    "model-based quality filter" stand-in: a logistic model over cheap
    deterministic text features, scored inline as pure column
    expressions. In production the weights come from a trained
    classifier; the SCORING path — the part that must touch all 100 TB
    — is exactly this map-only pass (no Python, no shuffle), so the
    engine-side cost model is identical with learned weights.

    Features: ln(1+tokens), stopword ratio, punctuation ratio, mean
    token length, type-token ratio. score = sigmoid(b + w·x); keep at
    score >= 0.5. Feature values and score round to 4dp so the SQL
    oracle hash-matches across float formatting.

    Output: (doc_id, log_n_tokens, stopword_ratio, punct_ratio,
    mean_token_len, type_token_ratio, score, keep), plus any
    ``extra_cols`` passed through verbatim (the default output is a
    registered driver-hashed schema — passthrough is opt-in so the
    contract cannot shift under existing consumers).
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    safe_n = F.greatest(n_tok, F.lit(1))
    n_stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    punct = F.length(F.regexp_replace(text_col, r"[^.!?,;:]", ""))
    feats = {
        "log_n_tokens": F.log(F.lit(1.0) + n_tok),
        "stopword_ratio": n_stop / safe_n,
        "punct_ratio": punct / F.greatest(F.length(text_col), F.lit(1)),
        "mean_token_len": F.aggregate(
            t, F.lit(0), lambda acc, x: acc + F.length(x)
        )
        / safe_n,
        "type_token_ratio": F.size(F.array_distinct(t)) / safe_n,
    }
    z = F.lit(float(bias))
    for w, expr in zip(weights, feats.values()):
        z = z + F.lit(float(w)) * expr
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        F.col(id_col).cast("long"),
        *[F.col(c) for c in (extra_cols or [])],
        *[F.round(e, 4).alias(n) for n, e in feats.items()],
        F.round(score, 4).alias("score"),
        (F.round(score, 4) >= 0.5).cast("long").alias("keep"),
    )


def bigram_perplexity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document bigram-LM perplexity — the CCNet/KenLM corpus
    filter: score every document under a language model estimated from
    the corpus itself; improbable token sequences (gibberish, boiler-
    plate soup) surface as high perplexity. The model here is the MLE
    bigram conditional P(w2|w1) = c(w1,w2)/c(w1) — every scored bigram
    is by construction in the counts, so no smoothing is needed.

    Plan shape: the bigram explode is one map-side transform; model
    estimation is a combinable (w1,w2) hash agg with the conditional
    denominator taken as a window over the POST-agg frame (model-sized,
    not corpus-sized); scoring joins doc bigrams to the model on
    (w1,w2) — model tables are vocab-bounded, so broadcast when they
    fit (AQE decides here) and shuffle-join on the bigram key when a
    100 TB corpus's vocabulary doesn't; the per-doc average is another
    combinable agg. ppl derives from the ROUNDED avg logprob on both
    engine and oracle so exp() can't amplify last-ulp differences.

    Output: (doc_id, n_bigrams, avg_logp, ppl).
    """
    # every shuffled key is a 64-bit hash, never the token strings:
    # _h12 identifies the bigram, _h1 its conditioning prefix (the
    # accepted digest collision class — a collision merges two counts).
    # Doc bigrams also pre-aggregate to (doc, bigram, n) BEFORE meeting
    # the model, so a document repeating one bigram 1000× joins once
    # and weights the average arithmetically — at corpus scale the
    # model join moves one row per DISTINCT (doc, bigram), not one per
    # token position.
    tk = tokens(text_col)
    # explode the plain positions FIRST and hash in the projection:
    # hashing inside a transform lambda runs interpreted per element
    # (r12: the same rewrite took substring_dedup's window digests
    # from 1.24 s to 0.68 s); the exploded projection is codegen'd
    pairs = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).cast("long").alias(id_col), tk.alias("_tk"))
        .where(F.size("_tk") >= 2)
        .select(
            id_col,
            "_tk",
            F.explode(F.sequence(F.lit(1), F.size("_tk") - 1)).alias("_i"),
        )
        .select(
            id_col,
            F.xxhash64(
                F.element_at("_tk", F.col("_i")),
                F.element_at("_tk", F.col("_i") + 1),
            ).alias("_h12"),
            F.xxhash64(F.element_at("_tk", F.col("_i"))).alias("_h1"),
        )
    )
    doc_counts = pairs.groupBy(id_col, "_h12").agg(F.count("*").alias("_nd"))
    counts = pairs.groupBy("_h12").agg(
        F.count("*").alias("_c12"), F.max("_h1").alias("_h1")
    )
    w1_win = Window.partitionBy("_h1")
    model = counts.withColumn(
        "_logp", F.log(F.col("_c12") / F.sum("_c12").over(w1_win))
    ).select("_h12", "_logp")
    return (
        doc_counts.join(model, "_h12")
        .groupBy(id_col)
        .agg(
            F.sum("_nd").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("_nd") * F.col("_logp")) / F.sum("_nd"), 4
            ).alias("avg_logp"),
        )
        .withColumn("ppl", F.round(F.exp(-F.col("avg_logp")), 2))
    )


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Query-time BM25 retrieval scoring (Robertson/Lucene idf form):

        score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
        idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

    the lexical-retrieval complement to the dense ANN family — what a
    RAG curation pipeline runs to pull candidate documents for a query
    before semantic re-ranking.

    Plan shape: per-term tf is an array-filter count on the tokenized
    text (map-only; the query's few terms never explode the corpus);
    the corpus statistics (N, Σ|d| for avgdl, per-term df) are ONE
    combinable aggregation to a 1-row frame that broadcasts back, so
    scoring is a second map-only pass — two corpus scans total, zero
    corpus shuffles. In production the stats frame is a precomputed
    index artifact and only the scoring scan remains. Returns
    (id, dl, score) for docs matching ≥1 term, score rounded 4dp."""
    t = tokens(text_col)

    # closure factory, NOT a defaulted second lambda arg: F.filter
    # passes the element INDEX to any 2-parameter lambda, which would
    # silently shadow the default
    def _tf(term: str):
        return F.size(F.filter(t, lambda x: x == term))

    base = docs.select(
        F.col(id_col), F.size(t).alias("dl"),
        *[_tf(term).alias(f"_tf{i}") for i, term in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count("*").alias("_N"),
        F.sum("dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl") / F.col("_N")
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_N") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        tf = F.col(f"_tf{i}")
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
    return (
        scored.withColumn("score", F.round(score, 4))
        .where(sum((F.col(f"_tf{i}") for i in range(len(query_terms))), F.lit(0)) > 0)
        .select(F.col(id_col).cast("long"), F.col("dl").cast("long"), "score")
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 5,
    lift_num: int = 6,
    lift_den: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Collocation mining: adjacent word pairs whose PMI lift exceeds
    ``lift_num/lift_den`` (default 1.2), ranked by pair frequency —
    the standard multi-word-expression pass in tokenizer-training
    pipelines (merge candidates that co-occur more than chance).

    Lift = p(w1,w2) / (p(w1)·p(w2)) with pair probability over bigram
    positions and word probabilities over tokens, i.e.
    ``pair·N_tok² / (N_pair·c1·c2)``. The threshold test is EXACT
    integer arithmetic — ``lift_den·pair·N_tok² > lift_num·N_pair·c1·c2``
    on decimal(38,0) — so the kept set is bit-identical on any engine;
    no float log appears anywhere (PMI's monotone in lift, so ranking
    and thresholding never need the log itself).

    Scale shape: three logical corpus passes (bigram counts, unigram
    counts, a skinny keyless tokens/pairs total), each aggregating
    map-side before its single exchange. Physically the unigram
    subtree plans once per join side (Spark derives each join input
    independently — four scans total); the count frames are
    vocab-sized, so in production you would cache/checkpoint `uc`
    if the tokenize pass dominates. The lift join touches only the
    count frames, never the corpus, and the 1-row totals frame is a
    broadcast (BNLJ bounded by its keyless agg). Zipf-head
    join skew on frequent words is bounded by the DISTINCT-bigram
    grain (a hot word contributes one row per distinct neighbor, not
    per occurrence); AQE skew-join covers the residue. Final top-k is
    TakeOrderedAndProject with a (w1,w2) tiebreak.
    """
    ws = tokens(text_col)
    d = docs.where(F.size(ws) >= 2).select(ws.alias("ws"))

    pairs = d.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2),"
                " i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))

    uc = (
        d.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("w_count"))
    )

    # one skinny keyless pass for the two scalars (no dependence on
    # pc/uc lineage — Spark would rescan those subtrees anyway)
    totals = d.agg(
        F.sum(F.size("ws") - 1).alias("n_pairs"),
        F.sum(F.size("ws")).alias("n_toks"),
    )

    dec = "decimal(38,0)"
    joined = (
        pc.join(uc.select(F.col("w").alias("w1"), F.col("w_count").alias("w1_count")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("w_count").alias("w2_count")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    lhs = (
        F.lit(lift_den).cast(dec)
        * F.col("pair_count").cast(dec)
        * F.col("n_toks").cast(dec)
        * F.col("n_toks").cast(dec)
    )
    rhs = (
        F.lit(lift_num).cast(dec)
        * F.col("n_pairs").cast(dec)
        * F.col("w1_count").cast(dec)
        * F.col("w2_count").cast(dec)
    )
    return (
        joined.where((F.col("pair_count") >= min_pair_count) & (lhs > rhs))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.col("w1_count").cast("long").alias("w1_count"),
            F.col("w2_count").cast("long").alias("w2_count"),
        )
        .orderBy(F.desc("pair_count"), "w1", "w2")
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# BPE merge-table application — tokenization as JVM string expressions
# ---------------------------------------------------------------------------
# A fixed, rank-ordered demo merge table (common English pairs over the
# chars+'</w>' word form bpe_merge_candidates counts). TOPOLOGICAL: a
# merge's inputs exist before it runs (rank 3 consumes ranks 1+2's
# outputs), matching how a learned table is ordered — fixed-order full
# application per rank is then equivalent to the canonical
# lowest-rank-first loop, because a merge can never create a pair of an
# EARLIER rank (earlier outputs are prefixes of later inputs, never the
# reverse, by construction of BPE learning).
BPE_DEMO_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"),
    ("t", "h"),
    ("th", "e</w>"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("s", "</w>"),
    ("d", "</w>"),
    ("o", "r"),
    ("e", "n"),
    ("a", "r"),
    ("a", "t"),
    ("s", "t"),
    ("t", "</w>"),
]


def bpe_apply_token_count(
    word_col: Column | str,
    merges: list[tuple[str, str]] | None = None,
) -> Column:
    """Number of BPE tokens a word tokenizes to under ``merges`` —
    computed ENTIRELY as JVM string expressions (chained replaces), no
    Python tokenizer in the loop: the word becomes the space-separated
    chars+'</w>' form (bpe_merge_candidates' representation) wrapped in
    boundary spaces, each merge is one ``replace(' a b ', ' ab ')``
    pass, and the token count is the final symbol count. One pass per
    merge uses the engine's leftmost non-overlapping replace — for a
    run of 3+ adjacent identical pairs a single pass merges every
    other occurrence (both engines of the correctness gate share the
    semantics, so results stay bit-identical cross-engine; canonical
    BPE would loop until fixed point). Cost per word is
    O(len·|merges|) of codegen'd string work — and callers apply it to
    the VOCABULARY (distinct words), never the corpus, so 100 TB of
    text pays tokenization proportional to word types."""
    c = F.col(word_col) if isinstance(word_col, str) else word_col
    s = F.concat(
        F.lit(" "),
        F.array_join(
            F.concat(F.split(c, ""), F.array(F.lit("</w>"))), " "
        ),
        F.lit(" "),
    )
    for a, b in merges or BPE_DEMO_MERGES:
        s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return F.size(F.split(F.trim(s), " "))


def bpe_apply_sql_expr(
    word_expr: str, merges: list[tuple[str, str]] | None = None
) -> str:
    """The DuckDB twin of ``bpe_apply_token_count`` — generated from
    the SAME merge list so the two engines cannot desync (the
    graph-constants interpolation pattern). Returns an SQL expression
    yielding the token count for ``word_expr``."""
    s = (
        "(' ' || array_to_string(list_append(string_split("
        + word_expr
        + ", ''), '</w>'), ' ') || ' ')"
    )
    for a, b in merges or BPE_DEMO_MERGES:
        s = f"replace({s}, ' {a} {b} ', ' {a}{b} ')"
    return f"len(string_split(trim({s}), ' '))"


def bpe_train_merges(
    words: DataFrame,
    n_merges: int = 8,
    word_col: str = "word",
    tf_col: str = "tf",
) -> list[tuple[str, str, int]]:
    """Train a BPE merge table — the N-round loop that
    ``bpe_merge_candidates`` is one iteration of (reference trains no
    tokenizer; this is the LLM-pipeline extension of the pair-stats
    operator). Follows the ``kmeans_fit_fixed_int`` discipline: FIXED
    round count, integer-exact tie-breaks (count DESC, sym_a ASC,
    sym_b ASC), one BOUNDED driver collect per round (exactly 1 row —
    the argmax pair), so an unrolled SQL oracle replays the training
    bit-identically.

    State per word type is ONE string column: the boundary-spaced
    chars+'</w>' form (`` c h a t </w> ``, the bpe_apply_token_count
    representation); applying round r's winning merge is one codegen'd
    ``replace(' a b ', ' ab ')`` over the vocab — leftmost
    non-overlapping single-pass semantics, identical in Spark and
    DuckDB, so trained tables and the apply path cannot desync.
    DELIBERATE DEVIATION from canonical BPE on repeated-symbol runs:
    single-pass replace consumes the shared boundary space, so with
    merge (a,a) the word ``a a a a`` becomes ``aa a a`` — canonical
    trainers rescan and produce ``aa aa``. Pair counts on such runs
    (and therefore trained tables on run-heavy corpora) differ from
    reference tokenizer trainers; the trade buys a pure-codegen merge
    step that both engines execute bit-identically. Round
    r's pair-count job executes r-1 accumulated replaces: total string
    work is O(N²/2 · |vocab|), VOCAB-bounded — at 100 TB the corpus
    pays one scan (the word-frequency agg feeding ``words``, which
    this function checkpoints once); every training round touches only
    word TYPES weighted by tf, exactly how distributed tokenizer
    trainers scale.

    Returns ``[(sym_a, sym_b, pair_count), ...]`` rank-ordered — the
    count is the pre-merge weighted pair count (under the
    non-overlapping run semantics above, not canonical BPE's rescan
    counts). Stops early if the vocabulary runs out of adjacent
    pairs."""
    state = words.select(
        F.col(tf_col).cast("long").alias("tf"),
        F.concat(
            F.lit(" "),
            F.array_join(
                F.concat(
                    F.split(F.col(word_col), ""), F.array(F.lit("</w>"))
                ),
                " ",
            ),
            F.lit(" "),
        ).alias("s"),
    ).localCheckpoint(eager=True)  # one corpus scan; rounds rescan vocab only

    merges: list[tuple[str, str, int]] = []
    s: Column = F.col("s")
    for _ in range(n_merges):
        syms = F.split(F.trim(s), " ")
        pairs = (
            state.select(
                syms.alias("cs"),
                F.col("tf"),
            )
            # a fully-merged word is ONE symbol; guard it out because
            # Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than
            # yielding empty like DuckDB's range(1, 1)
            .where(F.size("cs") >= 2)
            .select(
                "tf",
                "cs",
                F.explode(
                    F.sequence(F.lit(1), F.size("cs") - 1)
                ).alias("i"),
            )
            .select(
                F.element_at("cs", F.col("i")).alias("a"),
                F.element_at("cs", F.col("i") + 1).alias("b"),
                "tf",
            )
            .groupBy("a", "b")
            .agg(F.sum("tf").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not pairs:
            break
        a, b, cnt = pairs[0]["a"], pairs[0]["b"], int(pairs[0]["cnt"])
        merges.append((a, b, cnt))
        s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return merges
