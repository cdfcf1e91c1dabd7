"""Deduplication operators for large-scale training-data pipelines.

All operators take/return DataFrames and compose with the rest of the
engine. Scale design notes per operator:

* exact_dedup — hash-groupBy on a digest of the normalized text. One
  shuffle on the digest; at 100 TB, digests are 16 bytes/row and the
  aggregation is map-side combinable.
* shingle_jaccard_pairs — word n-gram shingles, exploded then
  self-joined on the shingle (inverted-index join). The join key is the
  shingle, so only documents *sharing* a shingle ever meet — no O(n²)
  cross join. Common-shingle skew is the hazard at scale: cap it by
  dropping shingles above a document-frequency ceiling (stopword
  shingles contribute ~0 discriminative signal).
* minhash_lsh_pairs — MinHash signatures banded into LSH buckets;
  candidate pairs only form within a bucket (band join), then exact
  jaccard verification on the candidates. This is the 100 TB path: cost
  scales with #candidates, not #pairs.
* simhash_pairs — 64-bit SimHash, near-dup = small Hamming distance;
  banding on bit-blocks (pigeonhole: d ≤ k differing bits → at least
  one of k+1 blocks identical) turns Hamming search into equi-joins.
* embedding_cosine_pairs — exact pairwise cosine above a threshold
  (reference baseline; single CartesianProduct — kept only as the
  oracle cross-check for the blocked variant). All cosine operators
  compute on COSINE_SCALE-quantized integer vectors: exact integer
  sums make the threshold gate bit-deterministic across engines
  (float GEMMs only DISCOVER candidates at threshold−ε).
* embedding_cosine_pairs_blocked — the REGISTERED exact path: block
  the vectors into G buckets, enumerate the G(G+1)/2 unordered block
  pairs as join tasks, and compute each block-pair's cosine matrix with
  one vectorized numpy GEMM inside applyInPandas. Same O(n²·d) FLOPS
  (exactness at a sub-0.5 threshold on dense vectors can't be pruned —
  LSH recall at cos≈0.45 is ~0 separation), but the PLAN is a single
  shuffle on the task key: no CartesianProduct node, G(G+1)/2
  evenly-sized tasks instead of one skewed cartesian, per-task memory
  bounded by 2·(n/G)·d — pick G so a block fits an executor. This is
  the standard reducer-blocked theta-join (1-bucket) shape; for
  approximate regimes use similarity.lsh_bucketed_topk / ivf_topk.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(col: Column | str = "text") -> Column:
    """lower + collapse whitespace + trim — canonical text form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.

    Returns one row per distinct content: (text_hash, canonical_id =
    min id, n_docs)."""
    return (
        docs.select(
            F.col(id_col), F.md5(normalized_text(text_col)).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).cast("long").alias("canonical_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


def word_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Pure column expressions: split → index sequence → explode → join
    adjacent tokens. Stays in whole-stage codegen."""
    toks = F.split(normalized_text(text_col), " ")
    sz = F.size(F.col("_toks"))
    # sequence(1, 0) would generate a DESCENDING sequence — guard short docs
    idx_arr = F.when(sz >= n, F.sequence(F.lit(1), sz - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    df = docs.select(F.col(id_col).alias("_id"), toks.alias("_toks")).select(
        "_id", "_toks", F.explode(idx_arr).alias("_i")
    )
    # F.get is 0-based and takes a Column index; _i is 1-based
    gram = F.concat_ws(
        " ", *[F.get("_toks", F.col("_i") - 1 + k) for k in range(n)]
    )
    return df.select("_id", gram.alias("shingle")).dropDuplicates()


def shingle_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Document pairs with word-n-gram Jaccard ≥ threshold.

    Inverted-index self-join on the shingle; ``max_shingle_df`` drops
    shingles appearing in more than that many docs (skew guard for the
    100 TB path — a shingle shared by millions of docs is pure noise).
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    This is the ORACLE/POC form: cost grows with co-occurring shingle
    pairs — measured 19.8× on 100× data (SCALE.md r9), the steepest
    curve in the dedup family, with MinHash-LSH + exact verification
    2.2× faster at 500k docs and pulling away. Above
    ``JACCARD_LSH_CROSSOVER_DOCS`` use ``minhash_lsh_pairs`` (same
    exact-precision contract) — ``jaccard_pairs_auto`` encodes the
    routing.
    """
    # Verification here counts co-occurrences (join on shingle →
    # groupBy pair) rather than carrying collect_set shingle sets as
    # minhash_lsh_pairs does: without LSH banding the candidate set IS
    # every co-occurring pair, and the count aggregates map-side while
    # set-carrying must materialize wide arrays per doc (measured 3.5×
    # slower at sf0.1). With banding the candidates are few and the
    # trade flips — that's why the two operators verify differently.
    # The bucket-array pair generation that sped up the LSH operators
    # (collect ids per key, emit pairs map-side) was also prototyped
    # here and measured SLOWER (2.20 s vs 1.70 s at sf0.1): posting
    # lists are mostly 1-2 docs, so millions of tiny array groups lose
    # to the equi-join's map-side combine. Keys with real fan-out are
    # exactly the ones max_shingle_df drops, keeping the join regime.
    # the index joins on xxhash64(shingle), not the shingle string:
    # 8-byte fixed keys through the self-join shuffle instead of
    # variable ~20-40-byte strings (same accepted collision class as
    # the minhash base hashes — ~|shingles|²/2⁶⁴)
    sh = word_shingles(docs, id_col, text_col, n).select(
        "_id", F.xxhash64("shingle").alias("_hs")
    )
    if max_shingle_df is not None:
        keep = sh.groupBy("_hs").count().where(F.col("count") <= max_shingle_df)
        sh = sh.join(keep.select("_hs"), "_hs")
    common = pair_common_counts(sh, "_id", "_hs")
    return (
        common.withColumn(
            "jaccard",
            F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


# Measured exact-jaccard vs LSH crossover (SCALE.md r9 sixth entry,
# disjoint-replica corpus, local[16]): at 50k docs the two are within
# noise (6.25 s vs 5.46 s); at 500k docs LSH is 2.2× faster (15.4 s vs
# 34.3 s) and the gap widens with corpus size because the exact join
# grows with co-occurring shingle PAIRS while banded candidates grow
# linearly. 50k is therefore the routing boundary: below it the exact
# join's lower constant wins, above it the asymptotics do.
JACCARD_LSH_CROSSOVER_DOCS = 50_000


def jaccard_pairs_auto(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
    corpus_docs: int | None = None,
    crossover_docs: int = JACCARD_LSH_CROSSOVER_DOCS,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Size-routed near-dup pairs (VERDICT r9 #4): the measured
    jaccard/LSH crossover as an API guard, so callers cannot ride the
    exact inverted-index join past the corpus size where it stops
    being the fast plan. At or below ``crossover_docs`` documents the
    exact ``shingle_jaccard_pairs`` runs (lower constant, zero recall
    caveats); above it the call WARNS and routes to
    ``minhash_lsh_pairs`` — same (id_a, id_b, jaccard) contract, same
    exact-precision guarantee (every candidate is verified with the
    true shingle jaccard), with recall governed by the banding
    (bands=16/rows=4 captures ≥ the 0.8 default threshold with
    near-certainty; the miss probability for a true 0.8-jaccard pair
    is (1 − 0.8⁴)^16 ≈ 0.1%).

    Pass ``corpus_docs`` when the size is already known (catalog
    stats, a prior count) to skip the counting job; otherwise one
    COUNT(*) over the id column runs — a footer-only/metadata
    aggregate on parquet sources, negligible against either join.

    Above the crossover the skew-guard VOCABULARY changes (ADVICE
    r10): ``max_shingle_df`` is an exact-join concept (drop shingles
    whose document frequency explodes the inverted-index self-join)
    and does NOT apply to the LSH plan — there the equivalent
    degenerate-mass guard is the ``max_bucket_size`` hot-bucket
    ceiling, forwarded here along with the ``num_hashes``/``bands``
    recall tuning, so a caller who tuned the exact path keeps
    equivalent (not silently dropped) controls on the routed path.
    The warning names the semantic shifts: exact → banded recall
    (≈ 99.9% at the default 0.8 threshold) and DF-prune → bucket
    ceiling."""
    n_docs = corpus_docs if corpus_docs is not None else docs.count()
    if n_docs <= crossover_docs:
        return shingle_jaccard_pairs(
            docs, id_col, text_col, n, threshold, max_shingle_df
        )
    import warnings

    df_note = (
        " max_shingle_df does not apply on this path; the hot-bucket "
        f"ceiling (max_bucket_size={max_bucket_size}) is the "
        "equivalent degenerate-mass guard."
        if max_shingle_df is not None
        else ""
    )
    warnings.warn(
        f"jaccard_pairs_auto: corpus of {n_docs} docs exceeds the "
        f"measured exact-join crossover ({crossover_docs}); routing to "
        "minhash_lsh_pairs + exact verification (SCALE.md r9: 2.2x "
        "faster at 500k docs and widening). Recall shifts from exact "
        f"to banded (~99.9% at threshold 0.8).{df_note}",
        stacklevel=2,
    )
    return minhash_lsh_pairs(
        docs,
        id_col,
        text_col,
        n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )


def pair_common_counts(items: DataFrame, id_col: str, key_col: str) -> DataFrame:
    """Inverted-index pair skeleton shared by the set-overlap operators
    (shingle Jaccard here; frame containment in operators/multimodal):
    from a distinct (id, key) membership frame, self-join on the key
    and count the per-pair common keys, then attach both sides' set
    sizes. The key should already be a fixed-width hash when the raw
    value is wide (8-byte shuffle keys). Returns
    (id_a, id_b, _common, _na, _nb) with id_a < id_b; the caller
    applies its own similarity metric and threshold gate."""
    # items feeds three consumers (sizes + both self-join sides);
    # unpinned, the caller's shingle derivation is replayed under each
    # (the r12 dedup_ngram_jaccard before-plan carries four scan
    # subtrees). Pin once — guide §3.3 — so the tokenize/explode pass
    # runs a single time; the pinned frame is the skinny (id, 8-byte
    # key) membership set, the smallest representation of the input.
    items = items.localCheckpoint(eager=False)
    sizes = items.groupBy(id_col).agg(F.count("*").alias("_n"))
    a = items.select(F.col(id_col).alias("id_a"), key_col)
    b = items.select(F.col(id_col).alias("id_b"), key_col)
    common = (
        a.join(b, key_col)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_common"))
    )
    return common.join(
        sizes.withColumnsRenamed({id_col: "id_a", "_n": "_na"}), "id_a"
    ).join(sizes.withColumnsRenamed({id_col: "id_b", "_n": "_nb"}), "id_b")


def shingle_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_pct: int = 90,
    min_size: int = 5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: pairs where the smaller document's
    shingle set is ≥ threshold_pct% contained in the other document.

    Containment C = |S(a)∩S(b)| / min(|S(a)|, |S(b)|) catches what
    Jaccard structurally cannot: a short document quoted or embedded
    verbatim inside a much longer one has C ≈ 1 while J ≈ |small|/|big|
    ≈ 0 — the classic training-data leak where a benchmark prompt or a
    boilerplate notice rides inside a larger page. The threshold gate is
    EXACT integer arithmetic (`common·100 ≥ pct·min(na,nb)`), so the
    boundary is bit-deterministic across engines; ``min_size`` floors
    the smaller set (a 1-shingle doc is trivially contained anywhere).

    Returns (contained_id, container_id, containment): contained is the
    doc with the smaller shingle set (tie → the larger id, so the
    keep-smallest-id dedup policy composes), containment rounded 4dp.

    Scale: identical plan family to shingle_jaccard_pairs — one
    inverted-index self-join on the 8-byte shingle hash, count-only
    aggregation (map-side combinable), ``max_shingle_df`` as the
    stopword-shingle skew guard. No new shuffle beyond the jaccard path.
    """
    sh = word_shingles(docs, id_col, text_col, n).select(
        "_id", F.xxhash64("shingle").alias("_hs")
    )
    if max_shingle_df is not None:
        keep = sh.groupBy("_hs").count().where(F.col("count") <= max_shingle_df)
        sh = sh.join(keep.select("_hs"), "_hs")
    common = pair_common_counts(sh, "_id", "_hs")
    least = F.least("_na", "_nb")
    gate = (F.col("_common") * 100 >= F.lit(int(threshold_pct)) * least) & (
        least >= int(min_size)
    )
    a_smaller = F.col("_na") < F.col("_nb")
    return common.where(gate).select(
        F.when(a_smaller, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .cast("long")
        .alias("contained_id"),
        F.when(a_smaller, F.col("id_b"))
        .otherwise(F.col("id_a"))
        .cast("long")
        .alias("container_id"),
        F.round(F.col("_common") / least, 4).alias("containment"),
    )


def _min_hash_exprs(num_hashes: int, seed: int, col: str = "_hs") -> list:
    """The k min-hash aggregate columns as parsed SQL expressions —
    ONE py4j call each instead of ~5 (F.min/F.xxhash64/F.lit/alias):
    the Column-API form cost ~1.1 s of driver-side DataFrame BUILD at
    k=128 (measured r12, the kmeans/unigram literal-storm finding
    applied to the hash family). xxhash64's integer literal seed stays
    an INT literal exactly as F.lit(seed + i) produced, so the hash
    values are bit-identical."""
    return [
        F.expr(f"min(xxhash64({seed + i}, {col})) AS _h{i}")
        for i in range(num_hashes)
    ]


def _band_bucket_sql(bands: int, rows_per_band: int) -> str:
    """band-bucket hashes 'xxhash64(_h{..})' fragments shared by the
    banded explode and the stored-state bucket array."""
    return ",".join(
        "xxhash64("
        + ",".join(f"_h{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")"
        for b in range(bands)
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """MinHash signature per document from a (_id, shingle) frame.

    Hash family: xxhash64(seed+i, shingle) for i in 0..k-1 — xxhash64 is
    variadic, so the family index is a second hashed column rather than
    a per-row string concat (k concat allocations/row saved).
    Deterministic, JVM-side, no Python. Returns (_id, sig array<long>[k])."""
    agg = sh.groupBy("_id").agg(
        *_min_hash_exprs(num_hashes, seed, col="shingle")
    )
    return agg.select(
        "_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    persist_shingles: bool = False,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding + exact verification.

    bands=16 × rows=4 over 64 hashes → candidate-capture threshold
    ≈ (1/16)^(1/4) ≈ 0.5 jaccard; candidates are then verified with the
    exact shingle jaccard, so precision is exact and only recall depends
    on the banding. Returns (id_a, id_b, jaccard).

    Hot-bucket ceiling: a degenerate band bucket (thousands of
    boilerplate-identical docs — common in real web corpora) would emit
    O(b²) candidate pairs concentrated in ONE task. Buckets larger than
    ``max_bucket_size`` therefore fall back to STAR candidates — every
    member pairs only with the bucket's pivot (min id), O(b) per bucket.
    Precision is untouched (every candidate still passes exact jaccard
    verification); pair-level recall inside a hot bucket degrades
    gracefully, but cluster connectivity — what near_dup_groups
    consumes — is preserved exactly in the case hot buckets actually
    represent (mutually near-identical docs: all members verify against
    the pivot, so the component stays connected). Small buckets are
    unaffected, so below the ceiling results are bit-identical to the
    unguarded plan; audit oversized buckets with ``lsh_hot_buckets``.
    ``None`` disables the guard AND switches candidate generation to
    the distributed band equi-self-join: the map-side pair-array plan
    squares a bucket inside one row pre-explode, which only the ceiling
    makes safe — uncapped, pairs must ride the shuffle instead.

    Aggregate shape, re-decided r11: ONE shared per-doc aggregate
    computes the k min-hashes AND the verification state (count +
    shingle-hash set) in a single scan+explode+exchange. The r6 round
    split these into two aggregations after measuring the then-current
    plan (band self-join consuming the signature frame twice) ~1.8×
    faster split; the r10 candidate path replaced that self-join with
    map-side pair emission from one (band,bucket) agg, which removed
    the extra signature consumers that made the shared set-state
    merges expensive — and the re-measures on TODAY'S plan
    (tools/minhash_split_probe.py — the split arm is rebuilt inline
    there, so the comparison reproduces at HEAD; identical pair
    output asserted) show the r6 split advantage GONE: r11 measured
    shared 2.43 s vs split 2.61 s at 10×, and the r12 best-of-6
    re-run landed 2.89 vs 2.79 s — a tie within box noise, with
    shared ~5% ahead at 1×. Shared wins on plan shape at equal time:
    one pass over the shingle stream instead of two once only the
    bucket agg reads the signatures. Verification intersects the carried shingle-hash sets per
    candidate pair (array_intersect) — cost scales with candidates,
    and the sets ride only into the (small) candidate join, never
    through the band explode. For corpora with multi-MB documents, cap
    document size upstream or shard the verification join.

    ``persist_shingles`` caches the exploded shingle frame before the
    aggregate — with the single shared aggregate it matters only when
    the caller's session reuses ``sh`` across jobs; kept for API
    stability.
    """
    rows_per_band = num_hashes // bands
    sh = word_shingles(docs, id_col, text_col, n)
    if persist_shingles:
        sh = sh.persist()
    # hash each variable-length shingle string ONCE to a 64-bit base,
    # then derive the k family hashes from the fixed-width base — k
    # hashes over 12 bytes instead of k hashes over the full string.
    # Verification intersects base-hash sets rather than string sets
    # (half the shuffle bytes; collision odds ~|shingles|²/2⁶⁴, the
    # same accepted class as md5 exact-dedup digests).
    sh = sh.select("_id", F.xxhash64("shingle").alias("_hs"))
    agg = sh.groupBy("_id").agg(
        *_min_hash_exprs(num_hashes, seed),
        F.count("*").alias("_n"),
        F.collect_set("_hs").alias("_set"),
    )
    # agg feeds THREE consumers (banding + both verification sides);
    # unpinned, Catalyst replays the scan + shingle explode + this
    # ObjectHashAggregate (collect_set drags the whole 66-function agg
    # off whole-stage codegen) once per consumer — the r12 before-plan
    # shows four scan subtrees, two of them the full set-carrying agg.
    # Pin it so the expensive pass runs once (guide §3.3: materialise
    # reused intermediates); the pinned row is exactly the
    # minhash_state posture (~8 B/shingle + the signature), the thing
    # a 100 TB deployment stores anyway. A map-side array_distinct
    # form that would avoid the exchange entirely was measured 6-8×
    # SLOWER (interpreted higher-order transform vs codegen explode —
    # /tmp probe r12, variants B/C/D vs A), so the groupBy stays.
    agg = agg.localCheckpoint(eager=False)

    band_structs = F.expr(
        "array("
        + ",".join(
            f"named_struct('band', {b}, 'bucket', "
            + "xxhash64("
            + ",".join(f"_h{b * rows_per_band + r}" for r in range(rows_per_band))
            + "))"
            for b in range(bands)
        )
        + ")"
    )
    banded = agg.select("_id", F.explode(band_structs).alias("bb")).select(
        "_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # Candidate generation: ONE (band,bucket) aggregation collecting the
    # member ids, pairs emitted MAP-SIDE from the sorted array — no band
    # self-join at all (measured ~30% faster than the former
    # join-the-frame-to-itself plan at sf0.1, identical output). The
    # hot-bucket ceiling lives in the same expression: a bucket larger
    # than ``max_bucket_size`` emits STAR candidates (every member
    # paired with the min id) instead of all O(b²) pairs, so a
    # boilerplate bucket costs O(b) — connectivity for near_dup_groups
    # is preserved because all members still verify against the pivot.
    # Memory note: the collect_list makes the bucket's id array ONE row
    # (8 bytes/member — a 10M-dup bucket is an 80 MB row) and the pair
    # array below squares that (O(b²) structs inside the SAME row before
    # the explode) — which is why this plan only runs WITH the ceiling:
    # a capped bucket's pair array is ≤ max_bucket_size² structs.
    if max_bucket_size is None:
        # Uncapped: never build the per-row pair array — a degenerate
        # bucket (100k boilerplate-identical docs → ~5e9 structs in one
        # row) would OOM the task. The equi-self-join distributes the
        # O(b²) pair space across the shuffle instead; slower on healthy
        # data (~30%, measured r4) but safe on any bucket profile.
        lhs = banded.select("band", "bucket", F.col("_id").alias("id_a"))
        rhs = banded.select("band", "bucket", F.col("_id").alias("id_b"))
        candidates = (
            lhs.join(rhs, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates()
        )
    else:
        buckets = banded.groupBy("band", "bucket").agg(
            F.array_sort(F.collect_list("_id")).alias("_ids")
        )
        all_pairs = F.flatten(
            F.transform(
                "_ids",
                lambda a, i: F.transform(
                    F.slice("_ids", i + 2, F.size("_ids")),
                    lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                ),
            )
        )
        star_pairs = F.transform(
            F.slice("_ids", 2, F.size("_ids")),
            lambda b: F.struct(F.element_at("_ids", 1).alias("id_a"), b.alias("id_b")),
        )
        pair_expr = F.when(F.size("_ids") <= max_bucket_size, all_pairs).otherwise(
            star_pairs
        )
        candidates = (
            buckets.select(F.explode(pair_expr).alias("p"))
            .select("p.id_a", "p.id_b")
            .dropDuplicates()
        )

    # exact verification on candidates only: set intersection per pair
    va = agg.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), F.col("_set").alias("_sa")
    )
    vb = agg.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), F.col("_set").alias("_sb")
    )
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def lsh_hot_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Audit companion to ``minhash_lsh_pairs``: the (band, bucket)
    cells whose size exceeds ``max_bucket_size`` — i.e. exactly the
    buckets the star fallback fired on — with their sizes, descending.
    Run this when the ceiling triggers to see what boilerplate cluster
    caused it (at scale: feed the members to exact_dedup, which handles
    identical content in one hash-agg without any pair explosion)."""
    rows_per_band = num_hashes // bands
    sh = word_shingles(docs, id_col, text_col, n).select(
        "_id", F.xxhash64("shingle").alias("_hs")
    )
    mins = [
        F.min(F.xxhash64(F.lit(seed + i), F.col("_hs"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("_id").agg(*mins)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"_h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return (
        agg.select("_id", F.explode(band_structs).alias("bb"))
        .groupBy(F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket_size)
        .orderBy(F.desc("bucket_size"))
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Near-dup pairs via 64-bit SimHash + block-pigeonhole banding.

    SimHash: per token a 64-bit hash; each bit votes +1/-1 weighted by
    term frequency; the sign of each bit-sum is the fingerprint bit.
    Pairs within ``max_hamming`` bits are found by splitting the 64 bits
    into ``blocks`` equal blocks (pigeonhole: hamming ≤ blocks-1 ⇒ some
    block matches exactly) and equi-joining per block.
    Returns (id_a, id_b, hamming).

    The fingerprint is one Arrow-batched pandas UDF (numpy bit votes,
    per-batch token-hash memoization): the JVM formulation needs 64
    conditional SUM aggregates over the exploded token frame — two
    shuffles and a 64-column agg buffer — where the UDF is a single
    narrow pass (measured ~4× faster; no shuffle until the block join).
    Hash family: the first 8 bytes of ``md5(f"{seed}:{token}")``
    (big-endian) — stable across processes AND reproducible in ANSI
    SQL (both DuckDB and Spark expose md5 hex), so a SQL oracle can
    hash-match the candidate pairs instead of a rows-only check.

    ``max_bucket_size`` is the same hot-bucket ceiling as
    ``minhash_lsh_pairs``: a (block, key) cell larger than the ceiling
    emits STAR candidates against the cell's min-id pivot (O(b), not
    O(b²)); Hamming verification still applies, so precision is exact
    and identical-doc clusters stay fully connected through the pivot.
    Below the ceiling results are bit-identical to the unguarded plan.
    ``None`` disables the guard and, as in ``minhash_lsh_pairs``, falls
    back to the distributed block equi-self-join so no single row ever
    holds a cell's O(b²) pair array.
    """
    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        hash_cache: dict[str, int] = {}
        bit_idx = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, txt in enumerate(texts):
            norm = re.sub(r"\s+", " ", (txt or "").lower().strip())
            toks = norm.split(" ") if norm else []
            if not toks:
                continue
            uniq: dict[str, int] = {}
            for tk in toks:
                uniq[tk] = uniq.get(tk, 0) + 1
            hs = np.empty(len(uniq), dtype=np.uint64)
            ws = np.empty(len(uniq), dtype=np.float64)
            for j, (tk, w) in enumerate(uniq.items()):
                h = hash_cache.get(tk)
                if h is None:
                    h = int.from_bytes(
                        hashlib.md5(f"{seed}:{tk}".encode()).digest()[:8],
                        "big",
                    )
                    hash_cache[tk] = h
                hs[j] = h
                ws[j] = w
            bits = ((hs[:, None] >> bit_idx) & np.uint64(1)).astype(np.float64)
            votes = (2.0 * bits - 1.0).T @ ws
            fp = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(b)
            out[i] = fp
        return pd.Series(out.view(np.int64))

    sigs = docs.select(
        F.col(id_col).alias("_id"), _simhash(F.col(text_col)).alias("simhash")
    )

    block_bits = 64 // blocks
    mask = (1 << block_bits) - 1
    block_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftright("simhash", i * block_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for i in range(blocks)
        ]
    )
    blocked = sigs.select("_id", "simhash", F.explode(block_structs).alias("bk")).select(
        "_id", "simhash", F.col("bk.block").alias("block"), F.col("bk.key").alias("key")
    )
    # Candidate generation mirrors the minhash rework: one (block,key)
    # aggregation collecting (id, simhash) structs — array_sort orders
    # by _id (first struct field), matching the old min-struct pivot —
    # pairs emitted map-side from the sorted array with the hot-bucket
    # ceiling folded into the same expression (star fallback above the
    # cap). This also leaves the Arrow fingerprint pass with EXACTLY
    # ONE consumer, so the former localCheckpoint materialization is
    # gone: no band self-join, no broadcast guard joins, no re-run.
    if max_bucket_size is None:
        # Uncapped escape hatch (same rationale as minhash_lsh_pairs):
        # the per-row pair array squares a degenerate cell inside one
        # row, so without the ceiling the candidates come from the
        # distributed block equi-self-join. The fingerprint pass gains
        # a second consumer here, so pin it once.
        blocked = blocked.localCheckpoint(eager=False)
        lhs = blocked.select(
            "block", "key", F.col("_id").alias("id_a"), F.col("simhash").alias("_sa")
        )
        rhs = blocked.select(
            "block", "key", F.col("_id").alias("id_b"), F.col("simhash").alias("_sb")
        )
        cand = (
            lhs.join(rhs, ["block", "key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_sa", "_sb")
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        buckets = blocked.groupBy("block", "key").agg(
            F.array_sort(F.collect_list(F.struct("_id", "simhash"))).alias("_m")
        )
        pair = lambda a, b: F.struct(  # noqa: E731
            a["_id"].alias("id_a"),
            b["_id"].alias("id_b"),
            a["simhash"].alias("_sa"),
            b["simhash"].alias("_sb"),
        )
        all_pairs = F.flatten(
            F.transform(
                "_m",
                lambda a, i: F.transform(
                    F.slice("_m", i + 2, F.size("_m")), lambda b: pair(a, b)
                ),
            )
        )
        star_pairs = F.transform(
            F.slice("_m", 2, F.size("_m")),
            lambda b: pair(F.element_at("_m", 1), b),
        )
        pair_expr = F.when(F.size("_m") <= max_bucket_size, all_pairs).otherwise(
            star_pairs
        )
        cand = (
            buckets.select(F.explode(pair_expr).alias("p"))
            .select("p.id_a", "p.id_b", "p._sa", "p._sb")
            .dropDuplicates(["id_a", "id_b"])
        )
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.col("hamming").cast("long"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    n_splits: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dups: bool = False,
    threshold: float = 0.8,
) -> DataFrame:
    """Deterministic train/val/test split that cannot leak duplicates
    across splits: the split key is the CANONICAL id of the document's
    exact-dedup group (min id per normalized-content digest), so every
    copy of the same content lands in the same split. With
    ``near_dups=True`` the canonical id is instead the connected
    component over the MinHash near-dup graph (near_dup_groups), so
    paraphrase-level duplicates can't straddle splits either.
    Reproducible across runs/partitionings (content-derived, no RNG).
    Returns (doc_id, canonical_id, split) with split in [0, n_splits).

    At scale: one digest shuffle (the dedup group-by) + a broadcast-able
    group→canonical map join; the near-dup variant adds the LSH pass."""
    if near_dups:
        groups = near_dup_groups(
            docs, id_col=id_col, text_col=text_col, threshold=threshold
        )
        return groups.select(
            F.col(id_col).cast("long"),
            F.col("group_id").alias("canonical_id"),
            F.pmod(F.col("group_id"), F.lit(n_splits)).cast("int").alias("split"),
        )
    hashed = docs.select(
        F.col(id_col), F.md5(normalized_text(text_col)).alias("_digest")
    )
    canon = hashed.groupBy("_digest").agg(
        F.min(id_col).cast("long").alias("canonical_id")
    )
    return (
        hashed.join(canon, "_digest")
        .select(
            F.col(id_col).cast("long"),
            "canonical_id",
            F.pmod(F.col("canonical_id"), F.lit(n_splits)).cast("int").alias("split"),
        )
    )


def connected_components_star(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — the GraphFrames algorithm): O(log n) rounds
    regardless of component DIAMETER, vs min-label propagation's
    O(diameter) rounds. This is the 100 TB path for near-dup graphs,
    whose weak-link chains make diameter ≫ log n (VERDICT r5: the
    sf0.1 0.4-cosine graph already needs ~31 label rounds).

    ``nodes``: one column ``node`` (long). ``pairs``: columns
    ``id_a``/``id_b`` (undirected edges, any orientation/duplication).

    Per round, with Γ(u) the current neighbors of u and
    m(u) = min(Γ(u) ∪ {u}):

    * large-star: for every directed edge (u, v) with v > u,
      emit (v, m(u)) — strictly-larger neighbors link to the local min;
    * small-star: for every directed edge (u, v) with v ≤ u, emit
      (v, m(u)), plus (u, m(u)) — u and its smaller neighbors contract
      onto the local min.

    Each step preserves connectivity and monotonically contracts toward
    star graphs centered at component minima; convergence is detected
    when the canonical edge set's (count, xor-of-hashes) signature is
    unchanged by a full round (bit_xor, not sum: commutative and
    overflow-free under ANSI). Each round localCheckpoints the edge
    frame — iterative lineage otherwise grows exponentially. Raises
    RuntimeError if unconverged after ``max_iter`` rounds rather than
    returning partial components.

    Plan shape (r12, guide §2.4 — remove exchanges from the hot loop):
    each star pass computes the neighborhood minimum with ONE window
    over partition(u) instead of a groupBy(u) + self-join back (which
    cost two exchanges and re-shipped every hub neighborhood to one
    task anyway, so the skew posture is unchanged); small-star emits
    its (u, m) self-edge from the v <= u rows via a 2-struct explode —
    whenever m < u such a row exists, and when m = u the self-edge is
    dropped as a loop, so the emitted edge SET is identical and the
    round-boundary dedup removes the multiplicity. The convergence
    signature rides ``observe()`` on the round's eager checkpoint, so
    computing it costs no extra pass over the edges. Measured on the
    100-chain graph (worst-case diameter): 6.07 s → 3.95 s best-of-4
    with bit-identical labels.

    Round cadence (r13, measured): checking convergence every 2nd
    round (halving the pins) was probed and REJECTED — late detection
    plus the unpinned double-round lineage (each star pass reads its
    input twice via the symmetrize union) measured 3.59 s vs 2.96 s on
    the 100-chain graph and 3.74 s vs 1.99 s on the semantic graph.

    Durability: localCheckpoint is executor-local/non-replicated —
    executor loss after a pin fails the job for a driver retry instead
    of recomputing lineage (SCALE.md "localCheckpoint durability"); a
    deployment needing in-run tolerance swaps in reliable checkpoint().

    Returns (node, label): label = min node id of the component;
    singletons label themselves. Cross-checked against the min-label
    implementation in tests (identical labels on random graphs and on
    a path graph whose diameter ≫ the round count)."""
    from pyspark.sql import Observation

    # canonical undirected edge set (u < v), self-loops dropped
    a, b = F.col("id_a").cast("long"), F.col("id_b").cast("long")
    w = Window.partitionBy("u")

    def _pin_sig(e: DataFrame) -> tuple[DataFrame, tuple]:
        # two INDEPENDENTLY-seeded hashes plus the count: a single
        # xor-of-hashes could collide (or xor-cancel) between two
        # different equal-sized edge sets and end the loop early with
        # silently wrong labels (ADVICE r6); requiring both 64-bit
        # signatures to agree squares that probability away. The
        # leading literal reseeds xxhash64 — a different function, not
        # a salt of the same one. observe() folds the signature into
        # the checkpoint-materialization job — no separate pass.
        obs = Observation()
        pinned = e.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("sig"),
            F.bit_xor(F.xxhash64(F.lit(0x9E3779B9), "u", "v")).alias("sig2"),
        ).localCheckpoint(eager=True)
        g = obs.get
        return pinned, (g["n"], g["sig"], g["sig2"])

    def _star(e: DataFrame, large: bool, dedup: bool) -> DataFrame:
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        ann = sym.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
        if large:
            out = ann.where(F.col("v") > F.col("u")).select(
                F.col("v").alias("x"), F.col("m").alias("y")
            )
        else:
            out = (
                ann.where(F.col("v") <= F.col("u"))
                .select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.col("v").alias("x"), F.col("m").alias("y")
                            ),
                            F.struct(
                                F.col("u").alias("x"), F.col("m").alias("y")
                            ),
                        )
                    ).alias("xy")
                )
                .select("xy.x", "xy.y")
            )
        out = out.select(
            F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
        ).where(F.col("u") != F.col("v"))
        # dedup is one Exchange per call; duplicate edges are
        # semantically inert to the star operations (m is a MIN over
        # the neighborhood), so the intermediate large-star output
        # skips it and only the round boundary canonicalizes — halves
        # the per-round exchange count, which is what dominates CC
        # wall-clock on small/medium graphs (the signature needs the
        # deduped form, so the round boundary must keep it)
        return out.dropDuplicates() if dedup else out

    edges, sig = _pin_sig(
        pairs.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
    )
    for _ in range(max_iter):
        edges, new_sig = _pin_sig(
            _star(_star(edges, large=True, dedup=False), large=False, dedup=True)
        )
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"max_iter={max_iter} rounds (edge signature still changing)"
        )
    # converged edge set is a union of stars (root = component min in
    # u-position): members take their root, roots/singletons themselves
    member_root = edges.groupBy(F.col("v").alias("node")).agg(
        F.min("u").alias("_root")
    )
    return nodes.join(member_root, "node", "left").select(
        "node", F.coalesce("_root", F.col("node")).alias("label")
    )


def near_dup_groups(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_iter: int = 30,
    algorithm: str = "star",
) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    gets the min doc id of its near-dup cluster as ``group_id``.

    ``algorithm="star"`` (default): large-star/small-star contraction
    (connected_components_star) — O(log n) rounds independent of
    component diameter, the production path (VERDICT r5 item 2). For
    star, ``max_iter`` bounds contraction rounds; the default 30
    matches connected_components_star's own default (components up to
    ~2^30 nodes — ADVICE r6: a max_iter=10 default silently capped
    no-arg callers at ~2^10-node components, smaller than what the old
    minlabel default could converge for shallow graphs). Convergence
    exits early, so the higher bound costs nothing when unused.

    ``algorithm="minlabel"``: iterative min-label propagation
    (label ← min(label, neighbors' labels)) — O(component diameter)
    rounds; kept as the independently-implemented cross-check the
    tests compare against, and the simpler form when clusters are
    known-shallow. Early-exit convergence check per round (one count
    per iteration, driver-side loop over LAZY frames — no data ever
    collected); each round localCheckpoints the label frame (iterative
    lineage otherwise grows exponentially). Both variants raise
    RuntimeError if unconverged after ``max_iter`` rounds rather than
    silently returning partial labels.
    Returns (doc_id, group_id); singleton documents are their own group.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(docs, id_col, text_col, threshold=threshold)
    if algorithm == "star":
        nodes = docs.select(F.col(id_col).cast("long").alias("node"))
        labels = connected_components_star(nodes, pairs, max_iter=max_iter)
        return labels.select(
            F.col("node").alias(id_col), F.col("label").alias("group_id")
        )
    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    labels = docs.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(id_col).cast("long").alias("label"),
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("_nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("_nmin", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.label") != F.col("l.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"near_dup_groups did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing): a near-dup component "
            "has diameter > max_iter; raise max_iter"
        )
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("group_id")
    )


# Embedding-cosine operators quantize vectors to integers at this scale
# before ANY arithmetic: exact integer sums are order-independent, so
# Spark folds, numpy candidate verification, and SQL oracles all derive
# the bit-identical cosine double (dot and per-vector norm sums stay
# far inside 2^53: |x_q| ≤ scale·max|x|, 64-dim dots ~1e13). The float
# GEMM paths keep their vectorized discovery but gate candidates with
# an exact integer re-score, never with the float value.
COSINE_SCALE = 10**6
# float-GEMM discovery margin: covers quantization + BLAS accumulation
# error (~1e-5 relative) so the exact gate sees every true candidate
_COSINE_DISCOVERY_EPS = 1e-4


def _quantized(vec_col: str, scale: int = COSINE_SCALE):
    """round(x·scale) as an int64 array column (same recipe on every
    engine: DuckDB CAST(round(CAST(x AS DOUBLE)·scale, 0) AS BIGINT))."""
    return F.transform(
        vec_col,
        lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0).cast("long"),
    )


def _exact_cos(a_int, b_int, saa_f, sbb_f):
    """Exact integer cosine for pre-indexed candidate rows (numpy):
    int64 dot (exact), then double division/sqrt on
    exactly-representable inputs — correctly-rounded IEEE ops on
    identical inputs, so the result is bit-identical to the Spark/SQL
    formulation."""
    dots = (a_int * b_int).sum(axis=1).astype(np.float64)
    return dots / np.sqrt(saa_f * sbb_f)


def embedding_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """Exact pairwise cosine ≥ threshold (baseline; O(n²) — the scale
    path is similarity.lsh_bucketed_topk). JVM-side fold, no UDF.
    Returns (id_a, id_b, cos_sim rounded 4).

    Cosines are computed on COSINE_SCALE-quantized integer vectors
    (see _quantized): integer dot/norm sums are exact and
    order-independent, so the threshold gate compares bit-identical
    doubles on every engine — a pair within an ulp of the threshold
    can never flip between Spark and a SQL oracle (the failure class
    ADVICE r5 flagged for q11; float-summed cosines reintroduce it
    because summation order differs across engines)."""
    v = emb.select(
        F.col(id_col).alias("_id"), _quantized(vec_col).alias("_q")
    ).withColumn(
        "_saa",
        F.aggregate(
            "_q", F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).cast("double"),
    )
    a = v.select(
        F.col("_id").alias("id_a"), F.col("_q").alias("_qa"), F.col("_saa").alias("_na")
    )
    b = v.select(
        F.col("_id").alias("id_b"), F.col("_q").alias("_qb"), F.col("_saa").alias("_nb")
    )
    dot = F.aggregate(
        F.zip_with("_qa", "_qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", dot / F.sqrt(F.col("_na") * F.col("_nb")))
        .where(F.col("cos_sim") >= threshold)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def embedding_cosine_pairs_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact pairwise cosine ≥ threshold, reducer-blocked (the scale
    plan; same results as ``embedding_cosine_pairs``).

    Vectors hash into ``n_blocks`` blocks; every unordered block pair
    (ga ≤ gb) is one task key, each vector is replicated to exactly the
    ``n_blocks`` tasks its block participates in, and one vectorized
    numpy GEMM per task DISCOVERS candidate pairs at threshold−ε; the
    gate itself is the exact integer cosine (_exact_cos) recomputed
    only for candidates, so membership is bit-deterministic across
    engines (float GEMM never decides a pair — its BLAS accumulation
    order differs from SQL sums by ulps, the q11 failure class). One
    shuffle on the task key, no CartesianProduct / join at all,
    G(G+1)/2 evenly-sized tasks; per-task memory is 2·(n/G)·d —
    at cluster scale pick ``n_blocks`` so a block fits an executor
    core. Rounding happens JVM-side so the two paths and the SQL
    oracle stay hash-identical.
    """
    spark = emb.sparkSession
    v = emb.select(
        F.col(id_col).cast("long").alias("id"),
        _quantized(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("g"),
    )
    mates = spark.range(n_blocks).select(F.col("id").cast("int").alias("h"))
    rep = (
        v.join(F.broadcast(mates))  # G tiny rows: broadcast replicate
        .select(
            "id",
            "vec",
            "g",
            F.least("g", "h").alias("ta"),
            F.greatest("g", "h").alias("tb"),
        )
    )
    disc = threshold - _COSINE_DISCOVERY_EPS

    def _block_pair(key, pdf):
        ga, gb = int(key[0]), int(key[1])
        ids = pdf["id"].to_numpy()
        mat_int = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
        mat = mat_int.astype(np.float64)
        saa = (mat * mat).sum(axis=1)  # exact: ints < 2^53
        nrm = np.sqrt(saa)
        if ga == gb:
            cos = (mat @ mat.T) / np.outer(nrm, nrm)
            ia, ib = np.nonzero(np.triu(cos >= disc, k=1))
            sim = _exact_cos(mat_int[ia], mat_int[ib], saa[ia], saa[ib])
            keep = sim >= threshold
            lo = np.minimum(ids[ia], ids[ib])[keep]
            hi = np.maximum(ids[ia], ids[ib])[keep]
            sim = sim[keep]
        else:
            amask = (pdf["g"].to_numpy() == ga)
            aid, bid = ids[amask], ids[~amask]
            am, bm = mat[amask], mat[~amask]
            an, bn = nrm[amask], nrm[~amask]
            if len(aid) == 0 or len(bid) == 0:
                return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
            cos = (am @ bm.T) / np.outer(an, bn)
            ia, ib = np.nonzero(cos >= disc)
            sim = _exact_cos(
                mat_int[amask][ia], mat_int[~amask][ib],
                saa[amask][ia], saa[~amask][ib],
            )
            keep = sim >= threshold
            lo = np.minimum(aid[ia], bid[ib])[keep]
            hi = np.maximum(aid[ia], bid[ib])[keep]
            sim = sim[keep]
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": sim})

    pairs = rep.groupBy("ta", "tb").applyInPandas(
        _block_pair, schema="id_a long, id_b long, cos_sim double"
    )
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim")
    )


def embedding_cosine_pairs_ivf(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_cells: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate pairwise cosine ≥ threshold via IVF cell blocking —
    the corpus-scale path for embedding near-dup when even the blocked
    exact GEMM (``embedding_cosine_pairs_blocked``, all-pairs cost) is
    too much: vectors are coarse-quantized to their nearest centroid
    (deterministic md5-draw centroids, ``similarity.select_centroids``)
    and pairs are scored ONLY within a cell — near-identical vectors
    land in the same cell with high probability, so recall concentrates
    exactly where near-dup mass does, and scored-pair cost drops from
    O(n²/blocks) to ~O(n²/n_cells) with cells aligned to similarity
    structure instead of arbitrary hash blocks.

    Per-cell scoring is one vectorized numpy GEMM per cell task
    (applyInPandas — the sanctioned Arrow exception, same as the
    blocked exact path); the only shuffle is the cell key. Cells are
    data-distribution-sized: at production scale pick n_cells so a cell
    fits an executor core, or run the blocked exact GEMM *within* hot
    cells. Cross-cell near-dups are missed by construction —
    recall/cost is the n_cells dial (the oracle pins the same-cell
    contract, not full recall). Returns (id_a, id_b, cos_sim)."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        add_ivf_cell,
        select_centroids,
    )

    cents = select_centroids(emb, n_cells, id_col, vec_col, seed)
    celled = add_ivf_cell(emb, cents, vec_col).select(
        F.col(id_col).cast("long").alias("id"),
        _quantized(vec_col).alias("vec"),
        "cell",
    )
    disc = threshold - _COSINE_DISCOVERY_EPS

    def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        mat_int = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
        mat = mat_int.astype(np.float64)
        saa = (mat * mat).sum(axis=1)  # exact integer sums in f64
        nrm = np.sqrt(saa)
        # float GEMM discovers at threshold-eps; the exact integer
        # cosine gates (bit-deterministic vs the SQL oracle)
        cos = (mat @ mat.T) / np.outer(nrm, nrm)
        ia, ib = np.nonzero(np.triu(cos >= disc, k=1))
        sim = _exact_cos(mat_int[ia], mat_int[ib], saa[ia], saa[ib])
        keep = sim >= threshold
        lo = np.minimum(ids[ia], ids[ib])[keep]
        hi = np.maximum(ids[ia], ids[ib])[keep]
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": sim[keep]})

    pairs = celled.groupBy("cell").applyInPandas(
        lambda _key, pdf: _cell_pairs(pdf),
        schema="id_a long, id_b long, cos_sim double",
    )
    return pairs.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))


def semantic_decontamination(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    bench_limit: int = 100_000,
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag every TRAIN doc
    whose embedding is within cosine ≥ ``threshold`` of ANY benchmark
    vector — the semantic complement of the n-gram
    ``decontamination_overlap`` (paraphrased eval questions share no
    13-gram but sit next to the benchmark in embedding space).

    Scale shape — the asymmetry IS the design: train is the 100 TB
    side, benchmark suites are bounded (10³–10⁵ rows), so the
    benchmark matrix is collected ONCE (guarded by ``bench_limit`` —
    exceeding it raises rather than silently truncating) and each
    train partition scores against it in a single vectorized numpy
    GEMM inside mapInPandas. ZERO shuffles: one map-only pass over
    train, no join, no pair explosion — unlike the self-join dedup
    paths, contamination never needs train×train structure.

    Exactness: both sides quantize to int64 (``_quantized``), the
    float GEMM only DISCOVERS candidates at threshold−eps, and every
    kept (count, max) is computed from ``_exact_cos`` on exact integer
    sums — bit-identical to the SQL oracle's dot/sqrt formulation.
    Returns contaminated rows only: (vec_id, n_bench_hits, max_cos)."""
    spark = train.sparkSession
    out_schema = "vec_id long, n_bench_hits long, max_cos double"
    rows = (
        bench.select(_quantized(vec_col).alias("vec"))
        .limit(bench_limit + 1)
        .collect()
    )
    if len(rows) > bench_limit:
        raise ValueError(
            f"benchmark side exceeds bench_limit={bench_limit}: the "
            "broadcast-GEMM plan is for bounded benchmark suites — "
            "for corpus-vs-corpus scoring use the IVF-celled pair path"
        )
    if not rows:
        return spark.createDataFrame([], out_schema)
    bmat = np.stack([np.asarray(r["vec"], dtype=np.int64) for r in rows])
    sbb = (bmat * bmat).sum(axis=1).astype(np.float64)
    disc = threshold - _COSINE_DISCOVERY_EPS

    src = train.select(
        F.col(id_col).cast("long").alias("id"), _quantized(vec_col).alias("vec")
    )

    def batches(it):
        bf = bmat.astype(np.float64)
        for pdf in it:
            if pdf.empty:
                continue
            amat = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
            saa = (amat * amat).sum(axis=1).astype(np.float64)
            cos = (amat.astype(np.float64) @ bf.T) / np.sqrt(
                np.outer(saa, sbb)
            )
            ia, ib = np.nonzero(cos >= disc)
            if len(ia) == 0:
                continue
            sim = _exact_cos(amat[ia], bmat[ib], saa[ia], sbb[ib])
            keep = sim >= threshold
            ia, sim = ia[keep], sim[keep]
            if len(ia) == 0:
                continue
            hits = np.bincount(ia, minlength=len(amat))
            maxc = np.full(len(amat), -np.inf)
            np.maximum.at(maxc, ia, sim)
            mask = hits > 0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["id"].to_numpy()[mask],
                    "n_bench_hits": hits[mask].astype("int64"),
                    "max_cos": np.round(maxc[mask], 4),
                }
            )

    return src.mapInPandas(batches, schema=out_schema)


def prefix_fingerprint(
    text_col: Column | str = "text", n_tokens: int = 8
) -> Column:
    """Digest of the first ``n_tokens`` normalized tokens — the coarse
    boilerplate-prefix key production ingest dedups on (URL-normalized
    or template-heavy pages collide on it long before full-text md5
    does)."""
    toks = F.split(normalized_text(text_col), " ")
    return F.md5(F.concat_ws(" ", F.slice(toks, 1, n_tokens)))


def incremental_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: int = 8,
) -> DataFrame:
    """Batch-vs-corpus dedup — the production daily-ingest flow: dedupe
    the incoming batch within itself (min id per digest), then anti-join
    the historical digest set; only novel content survives.

    ``seen_hashes`` needs one ``text_hash`` column. Scale shape: the
    batch is small and dedupes with one map-side-combinable hash agg;
    the anti-join shuffles on the digest — at 100 TB keep the digest
    table bucketed by ``text_hash`` so the anti-join co-locates and the
    corpus side never reshuffles. Returns (id, text_hash) of novel docs.
    """
    batch = (
        new_docs.select(
            F.col(id_col), prefix_fingerprint(text_col, n_tokens).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(F.min(id_col).cast("long").alias(id_col))
    )
    return batch.join(
        seen_hashes.select("text_hash"), "text_hash", "left_anti"
    ).select(id_col, "text_hash")


def minhash_state(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Per-document near-dup INDEX row: everything LSH admission needs
    without the text — ``(id, n_shingles, shingle_set, buckets)`` where
    ``buckets[b]`` is the band-b bucket hash. This is the state a
    production ingest stores (append one row per admitted doc) so that
    future batches never rescan admitted text. Row size ~8 bytes per
    distinct shingle plus the fixed band array; bucket the stored table
    by id at scale."""
    rows_per_band = num_hashes // bands
    sh = word_shingles(docs, id_col, text_col, n).select(
        "_id", F.xxhash64("shingle").alias("_hs")
    )
    agg = sh.groupBy("_id").agg(
        *_min_hash_exprs(num_hashes, seed),
        F.count("*").alias("_n"),
        F.collect_set("_hs").alias("_set"),
    )
    buckets = F.expr(f"array({_band_bucket_sql(bands, rows_per_band)})")
    return agg.select(
        F.col("_id").cast("long").alias(id_col),
        F.col("_n").alias("n_shingles"),
        F.col("_set").alias("shingle_set"),
        buckets.alias("buckets"),
    )


def near_dup_pairs_vs_state(
    new_state: DataFrame,
    corpus_state: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """LSH collision + exact verification between two ``minhash_state``
    frames: the (small) new side's band keys AND verification sets ride
    broadcast joins, the corpus side is scanned once and never
    self-joined or pair-exploded. Returns (new_id, corpus_id, jaccard)
    at ``threshold``+."""
    nb = new_state.select(
        F.col(id_col).alias("new_id"),
        F.posexplode("buckets").alias("band", "bucket"),
    )
    cb = corpus_state.select(
        F.col(id_col).alias("corpus_id"),
        F.posexplode("buckets").alias("band", "bucket"),
    )
    cand = (
        cb.join(F.broadcast(nb), ["band", "bucket"])
        .select("new_id", "corpus_id")
        .dropDuplicates()
    )
    va = new_state.select(
        F.col(id_col).alias("new_id"),
        F.col("n_shingles").alias("_na"),
        F.col("shingle_set").alias("_sa"),
    )
    vb = corpus_state.select(
        F.col(id_col).alias("corpus_id"),
        F.col("n_shingles").alias("_nb"),
        F.col("shingle_set").alias("_sb"),
    )
    return (
        cand.join(F.broadcast(va), "new_id")
        .join(vb, "corpus_id")
        .withColumn("_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("new_id").cast("long"),
            F.col("corpus_id").cast("long"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def incremental_near_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Batch-vs-corpus NEAR-dup admission — the production daily-ingest
    flow for paraphrase-level duplicates (the near-dup twin of
    ``incremental_dedup``'s exact-digest anti-join): MinHash-band the
    small incoming batch, broadcast its (band, bucket) keys against the
    corpus's banded signatures, and exact-verify only the collisions.
    Returns (new_id, corpus_id, jaccard) pairs at ``threshold``+;
    admission = anti-join the batch against the distinct new_id side.

    Scale shape — the whole point at 100 TB: the CORPUS side is never
    self-joined, never pair-exploded, and its per-doc signature row is
    exactly ``minhash_state`` — precompute/store it once (the streaming
    form, ``streaming/corpus.run_near_dedup_ingest``, does exactly
    this) and this function's corpus stage becomes a table scan. The
    batch side (bands AND verification sets) rides broadcast joins, so
    the only corpus-sized work is one banded scan plus verification of
    actual collisions. Within-batch duplicates are deliberately NOT
    reported (run ``minhash_lsh_pairs`` on the batch for that)."""
    args = dict(
        id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, bands=bands, seed=seed,
    )
    return near_dup_pairs_vs_state(
        minhash_state(new_docs, **args),
        minhash_state(corpus_docs, **args),
        id_col=id_col,
        threshold=threshold,
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination (GPT-3/Pile n-gram protocol): train
    docs sharing ≥ ``min_overlap`` distinct word n-grams with any eval
    doc. Inverted-index join on the shingle — only docs sharing one
    ever meet; the overlap count aggregates map-side; the eval side (a
    benchmark suite) is tiny and broadcasts. ``max_shingle_df`` drops
    shingles present in more than that many eval docs — the skew lever
    when eval sets contain boilerplate. Returns (train_doc_id,
    eval_doc_id, n_overlap)."""
    # join on xxhash64(shingle), not the n-gram string: 8-byte fixed
    # keys through the index join instead of ~30-60-byte 5-gram strings
    # (r13; the same accepted collision class as shingle_jaccard_pairs'
    # hashed inverted index — ~|shingles|²/2⁶⁴)
    tr = word_shingles(train_docs, id_col, text_col, n).select(
        F.col("_id").alias("train_doc_id"),
        F.xxhash64("shingle").alias("shingle"),
    )
    ev = word_shingles(eval_docs, id_col, text_col, n).select(
        F.col("_id").alias("eval_doc_id"),
        F.xxhash64("shingle").alias("shingle"),
    )
    if max_shingle_df is not None:
        keep = ev.groupBy("shingle").count().where(F.col("count") <= max_shingle_df)
        ev = ev.join(keep.select("shingle"), "shingle")
    return (
        tr.join(ev, "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
        .select(
            F.col("train_doc_id").cast("long"),
            F.col("eval_doc_id").cast("long"),
            F.col("n_overlap").cast("long"),
        )
    )


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 16,
) -> DataFrame:
    """Corpus-wide duplicate-segment removal — the C4/RefinedWeb line-
    dedup op (boilerplate paragraphs repeated across pages are excised
    once the corpus has seen them). Documents are cut into fixed
    ``seg_tokens``-token segments (chunk_documents with overlap=0, so
    segmentation itself is map-only); each segment keeps only its FIRST
    occurrence corpus-wide, first = lowest (doc_id, segment index); the
    surviving segments are stitched back per document.

    Plan shape: two shuffles total — one window partitioned by the
    segment digest (hash-distributed; no key concentrates because the
    digest is uniform, and a degenerate corpus of one repeated
    boilerplate segment puts O(dups) rows in ONE rank partition but the
    window computes row_number in a single streaming pass, not a
    pairwise blowup), then one groupBy on the document key for
    reassembly. No similarity math, no candidate pairs — this is the
    cheap exact pass that runs BEFORE MinHash in a real pipeline.

    The digest is md5 (128-bit), deliberately NOT the 64-bit xxhash64
    used for join keys elsewhere: here a hash collision DROPS content
    (two distinct segments treated as duplicates). At 100 TB segment
    counts reach ~10^10, where 64-bit birthday collisions are expected
    (>1) but 128-bit odds stay ~10^-19 — identity hashes that gate
    deletion get 128 bits; join/count keys where a collision only
    perturbs a statistic get 64.

    Output: (doc_id, text_kept, n_segments_kept, n_segments,
    n_tokens_kept) — docs whose every segment was already seen
    elsewhere surface with empty text_kept rather than vanishing, so
    downstream accounting sees the removal.
    """
    from aws_ipl_data_pipeline_spark.operators.chunking import chunk_documents

    segs = chunk_documents(
        docs, id_col=id_col, text_col=text_col, chunk_tokens=seg_tokens, overlap=0
    )
    w = Window.partitionBy(F.md5(F.col("chunk_text"))).orderBy(
        F.col(id_col), F.col("chunk_id")
    )
    kept = segs.withColumn("_rk", F.row_number().over(w))
    n_segs_total = F.ceil(
        F.greatest(F.max("n_tokens"), F.lit(1)) / F.lit(seg_tokens)
    ).cast("long")
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_rk") == 1,
                                    F.struct("chunk_id", "chunk_text"),
                                )
                            )
                        ),
                        lambda s: F.array(s["chunk_text"]),
                    )
                ),
            ).alias("text_kept"),
            F.sum((F.col("_rk") == 1).cast("long")).alias("n_segments_kept"),
            n_segs_total.alias("_n_segments"),
            F.sum(
                F.when(F.col("_rk") == 1, F.col("chunk_n_tokens")).otherwise(0)
            ).alias("n_tokens_kept"),
        )
        .select(
            F.col(id_col).cast("long").alias(id_col),
            "text_kept",
            F.col("n_segments_kept").cast("long"),
            F.col("_n_segments").alias("n_segments"),
            F.col("n_tokens_kept").cast("long"),
        )
    )


def shingle_jaccard_pairs_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Word-n-gram Jaccard pairs via PPJoin-style PREFIX FILTERING —
    the algorithmic upgrade over the plain inverted-index join
    (`shingle_jaccard_pairs`): identical output, provably, with the
    candidate space cut from "every co-occurring pair" to "pairs whose
    rare-shingle prefixes touch".

    Principle (Xiao et al., WWW'08): order each document's shingles by
    a GLOBAL total order (document frequency ascending, hash as
    tiebreak — rarest first); for jaccard >= t a document with k
    shingles needs overlap > t/(1+t)·(k_a+k_b), so if two docs share
    NO shingle among each one's first p = k - ceil(t·k) + 1 shingles,
    they cannot qualify. At t=0.8 the prefix is ~20% of each doc —
    the index join touches a fifth of the postings, and frequent
    (stop-phrase) shingles never generate candidates at all because
    they sort to the suffix. A length filter (t·k_a <= k_b) prunes
    further before verification.

    Plan shape: one DF agg over the shingle stream (combinable) joined
    back to rank shingles per doc (window on the doc key), prefix
    self-join on the 64-bit shingle hash, verification by
    array_intersect over carried shingle-hash sets — candidate-
    proportional, exactly like minhash verification. Returns
    (id_a, id_b, jaccard), bit-identical to shingle_jaccard_pairs.

    When to use which (measured): on the synthetic near-uniform-DF
    corpus the plain inverted index wins (~1.3 s vs ~2.0 s at sf0.1) —
    there are no hot shingles to prune, so the prefix pass pays its
    ranking window for nothing. On real web corpora the DF distribution
    is Zipfian and the trade inverts: the plain join's only defense
    against a boilerplate shingle shared by millions of docs is the
    ``max_shingle_df`` ceiling, which DROPS those shingles (recall
    loss); prefix filtering sends them to the suffix instead — they
    never generate candidates yet still count toward verification, so
    the result stays EXACT under skew. Ceiling = fast and lossy,
    prefix = exact and skew-immune; both ship, pick per corpus.
    """
    sh = word_shingles(docs, id_col, text_col, n).select(
        "_id", F.xxhash64("shingle").alias("_hs")
    )
    # sh feeds three consumers (dfreq, profile, ranked) — pin it so the
    # tokenize/explode pass runs once (r13, the pair_common_counts
    # items-pin rationale)
    sh = sh.localCheckpoint(eager=False)
    dfreq = sh.groupBy("_hs").agg(F.count("*").alias("_df"))
    profile = sh.groupBy("_id").agg(
        F.count("*").alias("_n"), F.collect_set("_hs").alias("_set")
    )
    ranked = (
        sh.join(dfreq, "_hs")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("_df", "_hs")
            ),
        )
        .join(profile.select("_id", "_n"), "_id")
    )
    prefix = ranked.where(
        F.col("_rn") <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
    ).select("_id", "_hs", "_n", "_rn")
    a = prefix.select(
        F.col("_id").alias("id_a"), "_hs",
        F.col("_n").alias("_na"), F.col("_rn").alias("_ra"),
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), "_hs",
        F.col("_n").alias("_nb"), F.col("_rn").alias("_rb"),
    )
    # positional filter (PPJoin, Xiao et al. §3.2 — r13, VERDICT r12
    # #6): a match at prefix positions (i, j) caps the achievable
    # overlap at ubound = 1 + min(k_a - i, k_b - j); gate it with the
    # SAME double formula as the final jaccard gate (ubound in place of
    # common), so any pair the verifier would accept keeps its first
    # (rarest-shingle) match and survives — provably lossless, and
    # strictly fewer candidate pairs reach verification.
    ubound = 1 + F.least(
        F.col("_na") - F.col("_ra"), F.col("_nb") - F.col("_rb")
    )
    candidates = (
        a.join(b, "_hs")
        .where(F.col("id_a") < F.col("id_b"))
        # length filter: |A∩B| <= min(k_a,k_b) and jaccard >= t force
        # t·k_a <= k_b and t·k_b <= k_a
        .where(
            (F.col("_nb") >= F.lit(threshold) * F.col("_na"))
            & (F.col("_na") >= F.lit(threshold) * F.col("_nb"))
        )
        .where(
            ubound / (F.col("_na") + F.col("_nb") - ubound)
            >= F.lit(threshold)
        )
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    va = profile.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), F.col("_set").alias("_sa")
    )
    vb = profile.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), F.col("_set").alias("_sb")
    )
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Exact substring-level dedup at stride-1 (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape,
    token granularity): any k-token window that occurs more than once
    corpus-wide keeps only its FIRST occurrence (lowest (doc, start));
    every token covered by a later occurrence is excised. Overlapping
    duplicate hits merge naturally because removal is token-coverage,
    not span bookkeeping. Unlike ``segment_dedup`` (fixed tiles,
    alignment-sensitive), stride-1 windows catch repeated passages at
    ANY offset — the op that removes licensing boilerplate pasted
    mid-document.

    Plan shape, in corpus passes: (1) window explode (map-only, ~one
    row per token), (2) one row_number window partitioned by the md5
    window digest (uniform key — no skew; dup ranking is a streaming
    pass, never pairwise), (3) per-doc removal-position agg (combinable
    flatten+distinct), (4) one doc-key join of those removal sets back
    to the docs (skinny: only docs with removals have a row), (5)
    map-only positional filter + reassembly. The digest is md5, not
    xxhash64, because collisions here DELETE content (the 128-bit
    discipline of segment_dedup applies).

    Caveat (shared with the original): excision joins the text on
    either side of a removed span, which can create NEW k-windows
    across the seam; one pass removes all ORIGINAL duplicates, and the
    first occurrence of every window survives verbatim. Docs shorter
    than k tokens emit no windows and pass through untouched. The
    first-occurrence order is global over (doc, start), so a document's
    OWN later repetitions of a window are excised too ("a"×2k keeps
    only the first k+? tokens) — the within-doc self-repetition case
    Lee et al. also remove; the model-based hypothesis test pins this.

    Returns (id, text_kept, n_tokens, n_tokens_removed, n_dup_windows).
    """
    tk = F.split(normalized_text(text_col), " ")
    base = docs.select(F.col(id_col).alias("_id"), tk.alias("_tk")).withColumn(
        "_n", F.size("_tk")
    )
    # explode the plain start positions FIRST, then digest in the
    # projection: the former shape computed md5(concat(slice)) inside a
    # higher-order transform lambda — interpreted per element (r12
    # lesson: HOF lambdas run off whole-stage codegen, measured 6-8×
    # slower than the exploded/codegen'd equivalent on the shingle
    # path). The exploded projection is codegen'd; the exchange above
    # still carries only (_id, s, dig).
    windows = (
        base.where(F.col("_n") >= k)
        .select(
            "_id", "_tk", F.explode(F.sequence(F.lit(0), F.col("_n") - k)).alias("s")
        )
        .select(
            "_id",
            "s",
            F.md5(
                F.concat_ws(" ", F.expr(f"slice(_tk, s + 1, {int(k)})"))
            ).alias("dig"),
        )
    )
    rk = windows.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("dig").orderBy("_id", "s")),
    )
    removals = (
        rk.where(F.col("_rn") > 1)
        .groupBy("_id")
        .agg(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.sequence(F.col("s"), F.col("s") + k - 1))
                )
            ).alias("_rem"),
            F.count("*").alias("_n_dup_windows"),
        )
    )
    joined = base.join(removals, "_id", "left").select(
        "_id",
        "_tk",
        "_n",
        F.coalesce("_rem", F.array().cast("array<int>")).alias("_rem"),
        F.coalesce("_n_dup_windows", F.lit(0)).alias("_n_dup_windows"),
    )
    # positional filter via a hash-map membership probe, not
    # array_contains: a linear scan of _rem per token is
    # O(n_tokens × n_removed) per document — a large fully-duplicated
    # doc (100k tokens, ~all removed) would do ~1e10 comparisons in one
    # row. The map is built once per doc (O(n_removed)) and each token
    # probes it O(1), so reassembly is O(n_tokens + n_removed).
    rem_map = F.map_from_entries(
        F.transform("_rem", lambda p: F.struct(p.alias("k"), F.lit(True).alias("v")))
    )
    joined = joined.withColumn("_rem_map", rem_map)
    kept = F.filter("_tk", lambda x, i: ~F.map_contains_key("_rem_map", i.cast("int")))
    return joined.select(
        F.col("_id").cast("long").alias(id_col),
        F.concat_ws(" ", kept).alias("text_kept"),
        F.col("_n").cast("long").alias("n_tokens"),
        F.size("_rem").cast("long").alias("n_tokens_removed"),
        F.col("_n_dup_windows").cast("long").alias("n_dup_windows"),
    )


def corpus_diff(
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-over-snapshot corpus diff: classify every document id
    as added / removed / changed / unchanged by comparing content
    digests across the two snapshots (the audit companion to
    ``sources/versioned.py`` time travel — what actually changed
    between gold v=N and v=N+1).

    One full-outer join on the id key, content equality on md5 digests
    computed map-side — no text ever shuffles, and the join key is the
    natural id, so at 100 TB this is one co-partitionable exchange per
    side. Returns (id, status, old_digest, new_digest)."""
    o = old_docs.select(
        F.col(id_col).alias("_id"),
        F.md5(normalized_text(text_col)).alias("old_digest"),
    )
    n = new_docs.select(
        F.col(id_col).alias("_id"),
        F.md5(normalized_text(text_col)).alias("new_digest"),
    )
    status = (
        F.when(F.col("old_digest").isNull(), "added")
        .when(F.col("new_digest").isNull(), "removed")
        .when(F.col("old_digest") != F.col("new_digest"), "changed")
        .otherwise("unchanged")
    )
    return (
        o.join(n, "_id", "full_outer")
        .select(
            F.col("_id").cast("long").alias(id_col),
            status.alias("status"),
            "old_digest",
            "new_digest",
        )
    )
