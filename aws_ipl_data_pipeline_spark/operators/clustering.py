"""Distributed k-means over an embedding column.

Two layers:

* ``assign_to_centroids`` — the map-only hot path: centroids arrive as a
  Python list (O(k·dim) — driver-small by construction, same budget as
  similarity.ivf_topk's cell table), distances unroll to JVM column
  expressions, argmin is an ``array_min`` over (dist, id) structs. No
  shuffle, no UDF: at 100 TB this pipelines into the scan.
* ``kmeans_fit`` — Lloyd iterations: assign → recompute means by
  (cluster, dimension) via posexplode + avg (map-side combinable hash
  agg, one shuffle of n·dim skinny rows per iteration) → collect the
  k·dim means to the driver → repeat. Converges when no assignment
  changes; raises if ``max_iter`` ends with assignments still moving,
  matching the honesty contract of dedup.near_dup_groups.

Initial centroids are the embeddings of deterministic ids (lowest k by
id hash — seedable, no RNG), so reruns and task retries see identical
clusters.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


from aws_ipl_data_pipeline_spark.functions.scalars import (
    lit_double_array as _lit_double_array,
    lit_long_array as _lit_long_array,
)


def _dist2(vec_col: str, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, element-folded on
    doubles in index order (the order the SQL oracle sums in)."""
    lit_vec = _lit_double_array(centroid)
    return F.aggregate(
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            lit_vec,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_to_centroids(
    emb: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared L2, ties to
    the lowest centroid id). Map-only: k distances as unrolled column
    expressions, argmin via array_min over (dist2, centroid_id) structs.

    Output: (id_col, centroid_id, dist2)."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(vec_col, vec).alias("d2"),
                    F.lit(int(cid)).cast("long").alias("cid"),
                )
                for cid, vec in sorted(centroids.items())
            ]
        )
    )
    return emb.select(
        F.col(id_col).cast("long").alias(id_col),
        best["cid"].alias("centroid_id"),
        F.round(best["d2"], 4).alias("dist2"),
    )


def seed_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> dict[int, list[float]]:
    """Deterministic seeds: the k vectors with the lowest md5(id) — a
    seeded shuffle of the ids, so any rerun picks the same k. Collect is
    O(k·dim)."""
    rows = (
        emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("cid").cast("string")), "cid")
        .limit(k)
        .collect()
    )
    return {int(r["cid"]): [float(x) for x in r["v"]] for r in rows}


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Lloyd's algorithm. Returns (assignments, centroids); assignments
    is ``assign_to_centroids`` output for the final centroids.

    ``id_col`` must be integral (it is cast to long before seeding, so
    string-typed numeric ids would change the md5 seeding draw vs their
    original representation — ADVICE r12 #3; every shipped caller
    passes a long id).

    Raises RuntimeError if assignments are still changing after
    ``max_iter`` iterations — unconverged clusters are never returned
    silently."""
    from pyspark.sql import Observation

    # consumed by the seeding job plus one pass per Lloyd round; pin
    # the projected working set once (guide §3.3)
    emb = emb.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
    ).localCheckpoint(eager=False)
    centroids = seed_centroids(emb, k, id_col, vec_col)

    def _cid(cents: dict[int, list[float]]) -> Column:
        return F.array_min(
            F.array(
                *[
                    F.struct(
                        _dist2(vec_col, vec).alias("d2"),
                        F.lit(int(cid)).cast("long").alias("cid"),
                    )
                    for cid, vec in sorted(cents.items())
                ]
            )
        )["cid"]

    # ONE job per Lloyd round (r13; the former shape paid THREE — a
    # moved-count join job against pinned previous labels, a pin job
    # for this round's labels, and the means collect — ~3× the per-round
    # scheduling and two extra evaluations of the assignment fold).
    # Here the means aggregation computes the NEW assignment inline
    # from the pinned working set, and from round 2 an observe()
    # counts rows whose assignment changed vs the PREVIOUS centroids
    # (a second map-side distance fold — cheaper than a shuffle join,
    # and it rides the same pass). Convergence semantics are identical:
    # the same (assign(c_{t-1}) vs assign(c_t)) comparisons happen in
    # the same order, the converged return value is the assignment
    # under the same centroids, and max_iter parity is preserved
    # (max_iter-1 comparisons before raising).
    prev_cents: dict[int, list[float]] | None = None
    for _ in range(max_iter):
        obs: Observation | None = None
        if prev_cents is not None:
            obs = Observation()
            base = emb.select(
                F.col(vec_col).alias("_v"),
                _cid(centroids).alias("_cid"),
                _cid(prev_cents).alias("_pcid"),
            ).observe(
                obs,
                F.sum((F.col("_cid") != F.col("_pcid")).cast("long")).alias(
                    "moved"
                ),
            )
        else:
            base = emb.select(
                F.col(vec_col).alias("_v"), _cid(centroids).alias("_cid")
            )
        means = (
            base.select("_cid", F.posexplode("_v").alias("i", "x"))
            .groupBy("_cid", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("_cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ms"))
            .collect()
        )
        if obs is not None and not obs.get["moved"]:
            return assign_to_centroids(emb, centroids, id_col, vec_col), centroids
        # a cluster with no members emits no mean rows; keep its previous
        # centroid instead of silently shrinking k (it can re-acquire
        # members as other centroids move)
        prev_cents = centroids
        centroids = dict(centroids)
        centroids.update(
            (int(r["_cid"]), [float(s["m"]) for s in r["ms"]]) for r in means
        )
    raise RuntimeError(
        f"k-means did not converge within {max_iter} iterations"
    )


def _dist2_int(qcol: str, centroid: list[int]) -> Column:
    """Exact integer squared-L2 to a literal quantized centroid: every
    term is a bigint product (|diff| ≤ 2·scale·max|x| ≈ 1.2e6, squared
    ≤ 1.5e12, ×64 dims ≈ 1e14 — comfortably inside int64), so the fold
    is bit-identical under ANY summation order and on any engine."""
    lit_vec = _lit_long_array(centroid)
    return F.aggregate(
        F.zip_with(F.col(qcol), lit_vec, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_fit_fixed_int(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's algorithm in ORACLE-EXACT integer arithmetic: the
    cross-engine-provable companion to ``kmeans_fit`` (VERDICT r5
    item 5). Same seeding shape and same per-iteration dataflow as the
    production float path — assignment is a map-only argmin over
    unrolled centroid expressions, the update is one skinny
    (cluster, dim) shuffle, and only O(k·dim) means ever reach the
    driver — but every number is deterministic across engines:

    * vectors quantize once to bigints (round(x·scale)) — float means
      are order-dependent in the last ulp across shuffle orders and
      engines, integer sums are not;
    * distances are exact int64 folds (no IEEE accumulation at all);
    * the centroid update rounds the exact rational mean S/n half-up
      via floor((2·s + n) / (2·n)) computed in double — exactness
      requires |2·s + n| < 2⁵³ (guarded below: s is the exact bigint
      dimension-sum of a cluster, so the bound caps cluster size at
      ~2⁵³/(2·scale·max|x|) ≈ 7e9 rows at the default scale), and IEEE
      division/floor are correctly rounded, so DuckDB's FLOOR of the
      same expression is bit-identical;
    * exactly ``iters`` update rounds, no convergence check: the
      replica is a pure function of (data, k, iters, scale).

    Seeds are the ``k`` vectors with the lowest md5('km:' || id)
    (centroid ids 0..k-1 in that order); empty clusters keep their
    previous centroid, matching kmeans_fit's contract. Returns the
    final assignment (id, centroid_id, dist2) with exact integer
    dist2."""
    q = emb.select(
        F.col(id_col).cast("long").alias(id_col),
        F.transform(
            vec_col,
            lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0).cast(
                "long"
            ),
        ).alias("_xq"),
    )
    # q is consumed iters+2 times (seeding + one assign per round + the
    # final assign); unpinned, each pass re-reads the source and re-runs
    # the interpreted per-element quantize transform. Pin the quantized
    # frame once (guide §3.3) — it is the integer working set every
    # round reads anyway.
    q = q.localCheckpoint(eager=False)
    seed_rows = (
        q.orderBy(
            F.md5(F.concat(F.lit("km:"), F.col(id_col).cast("string"))), id_col
        )
        .limit(k)
        .collect()
    )
    cents: dict[int, list[int]] = {
        j: [int(x) for x in r["_xq"]] for j, r in enumerate(seed_rows)
    }

    def _assign(c: dict[int, list[int]]) -> DataFrame:
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        _dist2_int("_xq", vec).alias("d2"),
                        F.lit(int(cid)).cast("long").alias("cid"),
                    )
                    for cid, vec in sorted(c.items())
                ]
            )
        )
        return q.select(
            id_col,
            "_xq",
            best["cid"].alias("centroid_id"),
            best["d2"].alias("dist2"),
        )

    for _ in range(iters):
        sums = (
            _assign(cents)
            .select("centroid_id", F.posexplode("_xq").alias("i", "x"))
            .groupBy("centroid_id", "i")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_cents = {cid: list(vec) for cid, vec in cents.items()}
        for r in sums:
            num = 2 * int(r["s"]) + int(r["n"])
            if abs(num) >= 2**53:
                # past 2^53 the double division is no longer exact on
                # identical inputs across engines — refuse to return a
                # silently-divergent "bit-identical" result
                raise OverflowError(
                    "kmeans_fit_fixed_int: |2*s+n| >= 2^53 for cluster "
                    f"{r['centroid_id']} dim {r['i']} — reduce scale or "
                    "shard the cluster; the cross-engine exactness "
                    "contract would break"
                )
            # round-half-up of the exact rational mean s/n, via the
            # same double-division-then-floor both engines evaluate
            new_cents[int(r["centroid_id"])][int(r["i"])] = int(
                math.floor(num / (2 * int(r["n"])))
            )
        cents = new_cents

    return _assign(cents).select(
        id_col,
        F.col("centroid_id"),
        F.col("dist2"),
    )


def assign_to_centroids_int(
    emb: DataFrame,
    centroids: dict[int, list[float]],
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer-exact nearest-centroid assignment — the oracle-provable
    form of ``assign_to_centroids`` (r6): vectors and centroids both
    quantize to the shared integer grid, squared distances are exact
    int64 folds (order-independent — no float summation anywhere in
    the DECISION), and ties break (d2, centroid_id). The reported
    dist2 is the exact integer distance rescaled to the float unit
    (d2/scale², rounded 4dp) — identical IEEE ops on identical exact
    inputs on every engine. The float ``assign_to_centroids`` remains
    the production hot path inside kmeans_fit; this twin is for
    surfaces whose assignment a SQL oracle re-derives."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        _quantize_list,
        _quantized_col,
    )

    q = emb.select(
        F.col(id_col).cast("long").alias(id_col),
        _quantized_col(vec_col).alias("_xq"),
    )
    cents_q = {int(c): _quantize_list(v) for c, v in centroids.items()}
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2_int("_xq", vec).alias("d2"),
                    F.lit(int(cid)).cast("long").alias("cid"),
                )
                for cid, vec in sorted(cents_q.items())
            ]
        )
    )
    return q.select(
        id_col,
        best["cid"].alias("centroid_id"),
        F.round(
            best["d2"].cast("double") / F.lit(float(scale) * float(scale)), 4
        ).alias("dist2"),
    )
