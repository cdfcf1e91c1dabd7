"""As-of and range joins over event streams.

Spark has no native ASOF JOIN; these are the two standard scalable
rewrites:

* asof_join — the union trick: tag both sides, sort once per key, carry
  the right side's latest value forward with last(ignorenulls) over a
  window. One shuffle on the key, no point-in-interval explosion. This
  is how as-of joins stay O(n log n) at 100 TB.
* range_join_bucketed — equi-join on a coarsened time bucket (+1
  neighbor) then exact range filter. Turns an inequality join (which
  Spark would execute as BroadcastNestedLoop) into an equi shuffle
  join; bucket width should match the range width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts < left_ts (strict) or ≤ (not strict), per key ``on``.

    Returns the left frame plus ``asof_<col>`` for each value column and
    ``asof_ts`` (the matched right timestamp), nulls when no match.
    """
    value_cols = value_cols or []
    lt = left.select(
        F.lit(1).alias("_is_left"),
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.struct(*left.columns).alias("_row"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    rt = right.select(
        F.lit(0).alias("_is_left"),
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(None).cast(lt.schema["_row"].dataType).alias("_row"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # order: at equal timestamps, a strict join must NOT see the right
    # row — sort left rows first (ties: right after left); non-strict
    # sorts right first.
    tie = F.col("_is_left").desc() if strict else F.col("_is_left").asc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lt.unionByName(rt)
        .withColumn("asof_ts", F.last("_r_ts", ignorenulls=True).over(w))
        .withColumns(
            {f"asof_{c}": F.last(f"_r_{c}", ignorenulls=True).over(w) for c in value_cols}
        )
    )
    out_cols = [F.col("_row." + c).alias(c) for c in left.columns]
    return carried.where(F.col("_is_left") == 1).select(
        *out_cols, "asof_ts", *[f"asof_{c}" for c in value_cols]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 300,
) -> DataFrame:
    """Pairs (left, right) with same key and
    left_ts < right_ts ≤ left_ts + window_seconds.

    Bucketing keeps it an equi-join: right rows can only fall in the
    left row's bucket or the next one.
    """
    def bucket(c: str):
        return F.floor(F.unix_micros(F.col(c)) / (window_seconds * 1_000_000))

    # prefix the right side to survive self-joins (left and right often
    # derive from the same source frame)
    lt = left.withColumn("_lb", bucket(left_ts))
    rt = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withColumn("_rb", bucket(f"r_{right_ts}"))
    joined = lt.join(
        rt,
        (F.col(on) == F.col(f"r_{on}"))
        & ((F.col("_rb") == F.col("_lb")) | (F.col("_rb") == F.col("_lb") + 1)),
    )
    lus = F.unix_micros(F.col(left_ts))
    rus = F.unix_micros(F.col(f"r_{right_ts}"))
    return joined.where(
        (rus > lus) & (rus <= lus + window_seconds * 1_000_000)
    ).drop("_lb", "_rb")
