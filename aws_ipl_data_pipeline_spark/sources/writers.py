"""Sinks (SURVEY §2.1 S6-S9): partition-predicate overwrite and friends.

The reference's idempotent per-match upsert is deltalake's
``write_deltalake(..., partition_by=["match","innings"],
mode="overwrite", predicate="match = '...'")``
(pipeline_2026/ex_match_bs.py:461-471). The Spark-native equivalent is
Delta ``replaceWhere``; when delta-spark isn't on the classpath we get
the same semantics from parquet dynamic partition overwrite
(``spark.sql.sources.partitionOverwriteMode=dynamic``): only the
partitions present in the written frame are replaced, all other
partitions stay byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # delta-spark is optional; everything works on parquet without it
    from delta.tables import DeltaTable  # noqa: F401

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    HAVE_DELTA = False


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    replace_where: str | None = None,
    fmt: str | None = None,
) -> None:
    """S6/S7: partitioned table write with per-partition overwrite.

    With Delta: ``replaceWhere`` replaces exactly the predicate's rows.
    Without: dynamic partition overwrite replaces only the partitions in
    ``df`` (the reference always overwrites whole match partitions, so
    the two are equivalent for its predicates, which are partition
    filters like ``match = 'X'``).
    """
    fmt = fmt or ("delta" if HAVE_DELTA else "parquet")
    w = df.write.format(fmt).partitionBy(*partition_by).mode(mode)
    if replace_where is not None:
        if fmt == "delta":
            w = w.option("replaceWhere", replace_where)
        else:
            # dynamic overwrite only touches partitions present in df;
            # keep the predicate as a guard on the written rows
            df_f = df.where(replace_where)
            w = df_f.write.format(fmt).partitionBy(*partition_by).mode("overwrite")
            w.option("partitionOverwriteMode", "dynamic").save(path)
            return
    if mode == "overwrite" and fmt != "delta":
        w = w.option("partitionOverwriteMode", "dynamic")
    w.save(path)


def upsert_by_key(
    spark,
    new_df: DataFrame,
    path: str,
    keys: list[str],
    fmt: str | None = None,
) -> None:
    """ST2/J8: idempotent keyed upsert — "insert or replace by natural
    key", newest write wins (the reference's append-then-dedupe bronze
    merge, ex_match_rb.py:201-213, with deterministic precedence).

    Delta path: a real MERGE (whenMatched update / whenNotMatched
    insert) — transactional, no table rewrite beyond touched files.
    Parquet path: read-union-dedupe-rewrite; the merged frame is
    localCheckpoint()ed first because lazily overwriting a path that is
    also being read is undefined (Spark refuses or corrupts). The
    parquet fallback rewrites the whole table — fine for bronze-sized
    layers; use Delta (or partition the upsert via write_partitioned)
    for fact-scale tables.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    fmt = fmt or ("delta" if HAVE_DELTA else "parquet")
    if fmt == "delta" and HAVE_DELTA:
        if DeltaTable.isDeltaTable(spark, path):
            tgt = DeltaTable.forPath(spark, path)
            cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
            (
                tgt.alias("t")
                .merge(new_df.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
        else:
            new_df.write.format("delta").save(path)
        return

    try:
        existing = spark.read.parquet(path)
        exists = True
    except Exception:
        exists = False
    if not exists:
        new_df.write.parquet(path)
        return
    merged = (
        new_df.withColumn("_pri", F.lit(0))
        .unionByName(existing.withColumn("_pri", F.lit(1)))
        .withColumn(
            "_rk", F.row_number().over(Window.partitionBy(*keys).orderBy("_pri"))
        )
        .where(F.col("_rk") == 1)
        .drop("_pri", "_rk")
    )
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S9: JSON-lines sink (reference to_json(orient='records',
    lines=True), ex_match_rb.py:210-221)."""
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False
) -> None:
    """S8: CSV sink; ``single_file`` coalesces for the reference's
    one-file-per-table parity (gld_match.py:317-319) — only for small
    gold outputs, never fact tables."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)
