"""Bucketed tables: pre-shuffled storage for co-located joins.

The reference never joins two fact-sized tables (its dims are tiny),
but at 100 TB the lineitem⋈orders class of join dominates: a sort-merge
join shuffles BOTH sides on the key every query. Bucketing pays that
shuffle once at write time — both tables hash-partitioned into the same
number of buckets on the join key — after which every join on that key
is exchange-free (Spark matches the tables' output partitioning to the
join requirement).

Rules that make the exchange actually disappear:
* same bucket count on both sides (or a divisor — AQE coalesces);
* join keys exactly the bucket columns;
* ``sortBy`` the bucket column so the merge phase needs no extra sort;
* bucketed tables must live in the catalog (``saveAsTable`` — path
  writes don't carry bucket metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) by ``key``.

    Bucket count is a capacity decision: target ≤ ~1 GB of that table
    per bucket at full scale so a single bucket pair fits an executor's
    memory during the merge."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys.

    With matching bucket layouts the physical plan is scan→(sort)→merge
    with NO Exchange on either side — verified by
    tests/test_bucketing.py."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
