"""Bronze plan: raw scraped ball CSV → parsed deliveries with running
innings state.

Replaces BOTH of the reference's row loops — the iterrows parse
(pipeline_2026/ex_match_rb.py:179-181) and the order-dependent
``get_innings`` fold (:127-154, "A12") — with column expressions and
window functions, so the same plan runs partitioned across a cluster.

Ordering contract: the reference relies on scrape-file row order. We make
that deterministic: within a match, deliveries are ordered by
``(extract_time, over, ball)`` — scrape time is monotone through a match
and survives re-partitioning, where pandas list order would not.

Innings semantics (reference :141): a new innings starts on a row with
``over==0 AND ball==1`` whose *previous* delivery had ``rebowl==0``; the
first row of a match is innings 1. Running score seeds with the first
ball's ``total_runs`` — the LOCAL pipeline's (correct) semantics
(pipeline_local/to_bronze/brnz_match.py:112-124); the cloud variant
resets to 0 and silently drops the first ball's runs
(pipeline_2026/ex_match_rb.py:150-153) — documented divergence, we follow
local.

Scale notes: one window partitioned by ``match`` (innings detection) and
one by ``(match, innings)`` (running sums). A match is ~250 rows, so
partitions are tiny and uniformly sized — no skew at any scale; the
shuffle key matches the silver table's partitioning so the sort is
reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.functions.events import parse_ball_event

ORDER_COLS = ["extract_time", "over", "ball"]


def to_bronze(raw: DataFrame, fix_run_out: bool = False) -> DataFrame:
    """raw deliveries (schemas.RAW_DELIVERIES) → bronze deliveries."""
    parsed = raw.withColumns(parse_ball_event(fix_run_out=fix_run_out))

    # reference dedupes full rows before the innings fold (ex_match_rb.py:183)
    parsed = parsed.dropDuplicates()

    w_match = Window.partitionBy("match").orderBy(*ORDER_COLS)

    new_innings = (
        F.when(
            (F.col("over") == 0)
            & (F.col("ball") == 1)
            & (F.lag("rebowl").over(w_match) == 0),
            1,
        )
        .otherwise(0)
    )
    w_cum = w_match.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_innings = parsed.withColumn(
        "innings", (1 + F.sum(new_innings).over(w_cum)).cast("int")
    )

    w_run = (
        Window.partitionBy("match", "innings")
        .orderBy(*ORDER_COLS)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_innings.withColumn("score", F.sum("total_runs").over(w_run).cast("int"))
        .withColumn("fallen_wickets", F.sum("wicket").over(w_run).cast("int"))
        .drop("venue", "ball_event", "event_info")
    )
