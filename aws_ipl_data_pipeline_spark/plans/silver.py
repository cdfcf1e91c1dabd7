"""Silver plan: bronze deliveries + match meta + player catalog →
enriched deliveries.

Re-expresses reference transform_to_silver
(pipeline_2026/ex_match_bs.py:281-349):

* type coercions with fillna defaults (:286-294) → casts + coalesce;
* derived features (:296-304) → column expressions;
* per-row ``assign_teams`` (:307-312) → a pure CASE-WHEN over the
  broadcast match-meta join (meta fields are per-match constants; the
  reference recomputed toss logic per row, we compute it per column);
* toss-winner fuzzy resolution against {home, away} (:225-230) →
  JVM-side ``levenshtein`` pick of the nearer name (two candidates only;
  ties and exact matches favor home, divergence from WRatio documented);
* team-scoped player-name normalization (:314-336) → blocked pandas-UDF
  fuzzy join over distinct names (functions/fuzzy.py);
* keyed dedupe on the delivery natural key (:347) — made deterministic:
  the reference keeps the first row in file order; we keep the first by
  ``extract_time`` via row_number, a stable contract under partitioning.

Scale: the meta join broadcasts (one row per match); name normalization
touches only distinct (team, name) pairs; the dedupe window partitions by
the delivery key — no full-table shuffle beyond the one keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.functions.fuzzy import normalize_names_multi
from aws_ipl_data_pipeline_spark.functions.scalars import flag, innings_phase
from aws_ipl_data_pipeline_spark.schemas import DELIVERY_KEY

ILLEGAL = ["wide", "no ball", "no-ball", "5 wides"]


def _resolve_toss_winner() -> F.Column:
    """toss_winner resolved to exactly home_team or away_team.

    Reference ex_match_bs.py:225-230 uses rapidfuzz over the two names
    with no cutoff — i.e. "nearest of the two"; levenshtein distance is
    an equivalent 2-candidate argmin, computed JVM-side.
    """
    tw, home, away = F.col("toss_winner"), F.col("home_team"), F.col("away_team")
    return (
        F.when(tw == home, home)
        .when(tw == away, away)
        .when(F.levenshtein(tw, home) <= F.levenshtein(tw, away), home)
        .otherwise(away)
    )


def to_silver(
    bronze: DataFrame,
    meta: DataFrame,
    players: DataFrame | None = None,
    cutoff: float = 75.0,
) -> DataFrame:
    """bronze (schemas.BRONZE_DELIVERIES) ⋈ meta (schemas.MATCH_META)
    [⋈ players (schemas.PLAYERS)] → silver (schemas.SILVER_DELIVERIES)."""
    df = (
        bronze
        # coercions + defaults, reference :286-294
        .withColumn("over", F.coalesce(F.col("over").cast("int"), F.lit(0)))
        .withColumn("ball", F.coalesce(F.col("ball").cast("int"), F.lit(1)))
        .withColumn("runs", F.coalesce(F.col("runs").cast("int"), F.lit(0)))
        .withColumn("extra_runs", F.coalesce(F.col("extra_runs").cast("int"), F.lit(0)))
        .withColumn("total_runs", F.coalesce(F.col("total_runs").cast("int"), F.lit(0)))
        .withColumn("wicket", F.coalesce(F.col("wicket").cast("int"), F.lit(0)))
        .withColumn("innings", F.coalesce(F.col("innings").cast("int"), F.lit(1)))
        .withColumn("rebowl", F.coalesce(F.col("rebowl").cast("int"), F.lit(0)))
        # derived features, reference :296-304
        .withColumn("over_decimal", F.round(F.col("over") + F.col("ball") / 10.0, 1))
        .withColumn("innings_phase", innings_phase("over"))
        .withColumn("is_dot_ball", flag(F.col("total_runs") == 0))
        .withColumn("is_boundary", flag(F.col("runs").isin(4, 6)))
        .withColumn("is_four", flag(F.col("runs") == 4))
        .withColumn("is_six", flag(F.col("runs") == 6))
        .withColumn(
            "is_legal_delivery", flag(~F.lower(F.col("extra_type")).isin(ILLEGAL))
        )
    )

    # per-match meta constants, broadcast join (reference reads the meta
    # dict per row, :307-312 and :338-344)
    meta_cols = meta.select(
        F.col("short_name").alias("match"),
        "home_team",
        "away_team",
        "toss_winner",
        "toss_decision",
        F.col("venue").alias("_meta_venue"),
        F.col("date").alias("_meta_date"),
    )
    df = df.join(F.broadcast(meta_cols), "match", "left")

    has_meta = F.col("home_team").isNotNull()
    valid = (
        has_meta
        & (F.col("home_team") != "N/A")
        & (F.col("away_team") != "N/A")
    )
    resolved_tw = _resolve_toss_winner()
    toss_loser = F.when(
        resolved_tw == F.col("home_team"), F.col("away_team")
    ).otherwise(F.col("home_team"))
    decision_bat = F.lower(F.coalesce(F.col("toss_decision"), F.lit(""))).contains("bat")
    inn1_batting = F.when(decision_bat, resolved_tw).otherwise(toss_loser)
    inn1_bowling = F.when(decision_bat, toss_loser).otherwise(resolved_tw)
    odd_innings = F.coalesce(F.col("innings"), F.lit(1)) % 2 == 1
    df = df.withColumn(
        "batting_team",
        F.when(valid, F.when(odd_innings, inn1_batting).otherwise(inn1_bowling)).otherwise("N/A"),
    ).withColumn(
        "bowling_team",
        F.when(valid, F.when(odd_innings, inn1_bowling).otherwise(inn1_batting)).otherwise("N/A"),
    )

    # meta passthrough columns (reference :338-344)
    df = (
        df.withColumn("venue", F.coalesce(F.col("_meta_venue"), F.lit("N/A")))
        .withColumn("toss_winner", F.coalesce(F.col("toss_winner"), F.lit("N/A")))
        .withColumn("toss_decision", F.coalesce(F.col("toss_decision"), F.lit("N/A")))
        .withColumn("date", F.coalesce(F.col("date"), F.col("_meta_date")))
        .drop("home_team", "away_team", "_meta_venue", "_meta_date")
    )

    # team-scoped fuzzy name normalization (reference :314-336) — one
    # distinct-pairs pass for all three columns (a per-column pass
    # re-evaluated the whole bronze fold per column)
    if players is not None:
        df = normalize_names_multi(
            df,
            players,
            [
                ("batsman", "batting_team"),
                ("bowler", "bowling_team"),
                ("out_batsman", "batting_team"),
            ],
            cutoff=cutoff,
        )

    # deterministic keyed dedupe: first by extract_time (reference :347
    # keeps first in file order)
    w = Window.partitionBy(*DELIVERY_KEY).orderBy("extract_time")
    df = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return df
