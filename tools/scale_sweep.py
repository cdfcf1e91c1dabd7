"""Scale-curve evidence for the dedup/ANN families (SCALE.md).

Builds 1x/5x/10x corpora from sf0.1 by replicating documents into
DISJOINT per-replica token spaces (every word prefixed `r<k>`, ids
offset) — so each replica reproduces the base corpus's near-dup
structure without creating cross-replica duplicates, and the candidate
-pair workload grows linearly with the corpus instead of quadratically.
Embeddings replicate with id offsets (ANN cost is corpus-size-driven).

Times dedup_minhash_lsh / dedup_simhash / ann_pq_topk at each scale
(noop sink, best-of-N after the bench-style warmup) and prints a
markdown table for SCALE.md.

Usage: python tools/scale_sweep.py [--iters 2] [--scales 1,5,10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.queries import REGISTRY
from aws_ipl_data_pipeline_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")
QUERIES = ["dedup_minhash_lsh", "dedup_simhash", "ann_pq_topk"]


def build(spark, mult: int) -> str:
    out = os.path.join(SCRATCH, f"scale{mult}x")
    # _OK_V2: embeddings now replicate with a per-replica CIRCULAR
    # SHIFT of the vector (r6) — identical copies made cross-replica
    # cosine pairs explode quadratically (every base pair appears
    # mult² times), which mis-measures pairwise-threshold workloads
    # (semantic_dedup_clusters, dedup_embedding_cosine*). Shifting all
    # of a replica's vectors by the same offset preserves every
    # INTRA-replica similarity exactly (rotation is orthogonal) while
    # cross-replica pairs decorrelate to background level — so the
    # pair workload grows linearly, matching the prefixed-token story
    # on the text side. ANN/topk workloads stay corpus-size-driven.
    if os.path.exists(os.path.join(out, "_OK_V2")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    reps = spark.range(mult).select(F.col("id").cast("int").alias("rep"))
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep").cast("long") * 100_000_000).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"), r"([a-z0-9]+)", F.concat(F.lit("r"), F.col("rep"), F.lit("$1"))
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    dim = len(emb.select("embedding").head()["embedding"])
    shifted = F.concat(
        F.slice(
            "embedding",
            (F.col("rep") % dim) + 1,
            F.lit(dim) - (F.col("rep") % dim),
        ),
        F.slice("embedding", 1, F.col("rep") % dim),
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep").cast("long") * 100_000_000).alias("vec_id"),
            shifted.alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    open(os.path.join(out, "_OK_V2"), "w").close()
    return out


def build_events(spark, mult: int, out: str) -> None:
    """Replicate events with per-replica user_id/event_id offsets —
    users never span replicas, so window/session workloads grow
    linearly (more users, same per-user history)."""
    if os.path.exists(os.path.join(out, "_OK_EVENTS")):
        return
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    reps = spark.range(mult).select(F.col("id").cast("int").alias("rep"))
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep").cast("long") * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep").cast("long") * 100_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    open(os.path.join(out, "_OK_EVENTS"), "w").close()


def build_tpch(spark, mult: int, out: str) -> None:
    """Replicate the TPC-H-ish star schema with per-replica KEY offsets
    — each replica is a disjoint mini-market (its own orders, parts and
    suppliers, sharing the nation/region dimensions), so join and
    catalog-derivation workloads (q2/q9/q20) grow linearly with no
    cross-replica key collisions and unchanged per-key densities."""
    if os.path.exists(os.path.join(out, "_OK_TPCH")):
        return
    reps = spark.range(mult).select(F.col("id").cast("int").alias("rep"))
    off = F.col("rep").cast("long") * 100_000_000

    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + off).alias("l_orderkey"),
            (F.col("l_partkey") + off).alias("l_partkey"),
            (F.col("l_suppkey") + off).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + off).alias("o_orderkey"),
            (F.col("o_custkey") + off).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    p = spark.read.parquet(f"{BASE}/part.parquet")
    (
        p.crossJoin(reps)
        .select(
            (F.col("p_partkey") + off).alias("p_partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/part.parquet")
    )
    s = spark.read.parquet(f"{BASE}/supplier.parquet")
    (
        s.crossJoin(reps)
        .select(
            (F.col("s_suppkey") + off).alias("s_suppkey"),
            "s_name", "s_nationkey", "s_acctbal",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/supplier.parquet")
    )
    c = spark.read.parquet(f"{BASE}/customer.parquet")
    (
        c.crossJoin(reps)
        .select(
            (F.col("c_custkey") + off).alias("c_custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )
    for dim in ("nation", "region"):
        spark.read.parquet(f"{BASE}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{dim}.parquet")
    open(os.path.join(out, "_OK_TPCH"), "w").close()


_TPCH_QUERIES = {
    "q2_min_cost_supplier", "q9_product_type_profit", "q11_important_stock",
    "q12_late_shipments", "q20_potential_promotion", "q1_pricing_summary",
    "sql_udf_battery", "sql_pipe_syntax", "copurchase_lift",
}


def main() -> None:
    global QUERIES
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--scales", default="1,5,10")
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    QUERIES = args.queries.split(",")

    spark = get_spark(app_name="scale-sweep")
    spark.read.parquet(f"{BASE}/region.parquet").count()  # JIT warmup

    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    for mult in scales:
        sf_dir = build(spark, mult)
        if any(
            n
            in (
                "sessionize_events",
                "scd2_user_state",
                "pagerank_covisit",
                "gap_fill_interpolate",
                "rolling_24h_stats",
                "user_value_trend",
                "bfs_khop_distances",
                "decayed_engagement",
                "cusum_drift_alarms",
                "attribution_last_touch",
                "session_funnel_paths",
                "event_transition_matrix",
                "user_twap",
            )
            for n in QUERIES
        ):
            build_events(spark, mult, sf_dir)
        if any(n in _TPCH_QUERIES for n in QUERIES):
            build_tpch(spark, mult, sf_dir)
        for name in QUERIES:
            fn = REGISTRY[name].fn
            runs = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            results[name][mult] = round(min(runs), 2)
            print(f"  {mult}x {name}: {results[name][mult]}s  {runs}", file=sys.stderr)

    base_docs = spark.read.parquet(f"{BASE}/documents.parquet").count()
    print(f"\n| query | " + " | ".join(f"{m}x ({m * base_docs / 1000:.0f}k docs)" for m in scales) + " | growth vs data |")
    print("|---|" + "---|" * (len(scales) + 1))
    for name in QUERIES:
        row = results[name]
        lo, hi = scales[0], scales[-1]
        growth = row[hi] / row[lo] if row[lo] else float("inf")
        print(
            f"| `{name}` | "
            + " | ".join(f"{row[m]} s" for m in scales)
            + f" | {growth:.1f}x time on {hi // lo}x data |"
        )


if __name__ == "__main__":
    main()
