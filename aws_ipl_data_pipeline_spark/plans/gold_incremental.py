"""Incremental gold maintenance (ST4 at 100×, VERDICT r6 item 4).

The reference recomputes all four gold tables from FULL silver on every
trigger (ex_match_sg.py:323-347) — faithful, but a scale-killer when
silver is 100 TB and one match changed. This module decomposes each
gold table into per-(match, key) PARTIAL aggregates:

  silver (per-delivery, huge)
    → match partials (one row per key per match — ~|players per match|
      rows per match; stored hash-BUCKETED by match, 256 dirs at any
      match count — see match_bucket_col for the r9 measurement that
      retired the per-match layout)
    → gold (merge partials per key + the shared finishers in
      plans/gold.py)

On a micro-batch only the affected matches' partials are recomputed
(from the batch's silver rows, already in memory) and their BUCKETS
dynamically overwritten — bucket REPLACE carrying sibling matches'
rows through (write_partials), not keyed upsert, so a rescrape that
drops a player also drops their stale partial row. The final merge
then scans the skinny partials table, never silver: per batch cost is
O(batch deliveries) + O(#keys × #matches), independent of total
silver size — and the partials scan lists O(256) directories, not
O(#matches).

Exactness: every partial is an integer sum/count (silver flags and run
columns are ints), so two-level aggregation is bit-identical to the
one-pass batch builders; countDistinct(match) becomes a count of
partial rows; max-of-sum becomes max over per-match sums; the nullable
Powerplay conditional sums stay null-skipping through both levels
(null iff no Powerplay rows at any level). All ratio math happens in
the SHARED finishers (`_finish_*` in plans/gold.py), so batch and
incremental cannot drift — pinned by tests/test_gold_incremental.py
(builder ≡ partials-merge on the golden fixtures, and batch backfill ≡
multi-batch incremental stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.functions.scalars import not_na
from aws_ipl_data_pipeline_spark.plans.gold import (
    _finish_batsman,
    _finish_bowler,
    _finish_standings,
    _finish_team,
)

# --------------------------------------------------------------------------
# partials: one row per (match, key); integer partial aggregates only
# --------------------------------------------------------------------------


def batsman_match_partials(silver: DataFrame) -> DataFrame:
    """(match, batsman) partials for gold_batsman_stats: the per-match
    batting sums plus the out count from the UNFILTERED table (the
    times_out quirk, reference ex_match_sg.py:137-140)."""
    df_bat = silver.where(not_na("batsman"))
    bat = df_bat.groupBy("match", "batsman").agg(
        F.sum("runs").alias("match_runs"),
        F.sum("is_legal_delivery").alias("legal_balls"),
        F.sum("is_four").alias("fours"),
        F.sum("is_six").alias("sixes"),
        F.sum("is_dot_ball").alias("dot_balls"),
    )
    outs = (
        silver.where(not_na("out_batsman"))
        .groupBy("match", F.col("out_batsman").alias("batsman"))
        .agg(F.count("*").alias("times_out"))
    )
    return (
        bat.withColumn("batted", F.lit(True))
        .join(outs, ["match", "batsman"], "outer")
        .withColumn("batted", F.coalesce("batted", F.lit(False)))
    )


def bowler_match_partials(silver: DataFrame) -> DataFrame:
    """(match, bowler) partials for gold_bowler_stats."""
    return (
        silver.where(not_na("bowler"))
        .groupBy("match", "bowler")
        .agg(
            F.sum("total_runs").alias("total_runs_conceded"),
            F.sum("is_legal_delivery").alias("legal_balls"),
            F.sum("wicket").alias("wickets"),
            F.sum("is_dot_ball").alias("dot_balls"),
            F.sum("is_four").alias("fours_conceded"),
            F.sum("is_six").alias("sixes_conceded"),
        )
    )


def standings_match_partials(silver: DataFrame) -> DataFrame:
    """(match, team) partials for gold_tournament_standings alone —
    only needs the five standings columns (match, batting_team,
    bowling_team, total_runs, is_legal_delivery), so it also runs on
    the team-grain standings fixtures."""
    df_clean = silver.where(not_na("batting_team") & not_na("bowling_team"))
    cbat = df_clean.groupBy("match", F.col("batting_team").alias("team")).agg(
        F.sum("total_runs").alias("runs_scored"),
        F.sum("is_legal_delivery").alias("legal_balls_batted"),
    )
    cbowl = df_clean.groupBy("match", F.col("bowling_team").alias("team")).agg(
        F.sum("total_runs").alias("runs_conceded"),
        F.sum("is_legal_delivery").alias("legal_balls_bowled"),
    )
    return (
        cbat.withColumn("has_clean_bat", F.lit(True))
        .join(
            cbowl.withColumn("has_clean_bowl", F.lit(True)), ["match", "team"], "outer"
        )
        .withColumn("has_clean_bat", F.coalesce("has_clean_bat", F.lit(False)))
        .withColumn("has_clean_bowl", F.coalesce("has_clean_bowl", F.lit(False)))
    )


def team_match_partials(silver: DataFrame) -> DataFrame:
    """(match, team) partials feeding BOTH gold_team_stats and
    gold_tournament_standings. The two consumers filter differently
    (team stats: not_na(batting_team); standings: not_na of both
    teams), so each side's sums are kept separately with a presence
    flag — the finishers re-select exactly their input population."""
    df_team = silver.where(not_na("batting_team"))
    tstat = df_team.groupBy(F.col("batting_team").alias("team"), "match").agg(
        F.sum("total_runs").alias("total_runs"),
        F.sum("wicket").alias("wickets_lost"),
        F.sum("is_legal_delivery").alias("legal_balls"),
        F.sum("is_four").alias("fours"),
        F.sum("is_six").alias("sixes"),
        F.sum(
            F.when(F.col("innings_phase") == "Powerplay", F.col("total_runs"))
        ).alias("pp_runs"),
        F.sum(
            F.when(F.col("innings_phase") == "Powerplay", F.col("is_legal_delivery"))
        ).alias("pp_balls"),
    )
    return (
        tstat.withColumn("has_bat", F.lit(True))
        .join(standings_match_partials(silver), ["match", "team"], "outer")
        .withColumn("has_bat", F.coalesce("has_bat", F.lit(False)))
        .withColumn("has_clean_bat", F.coalesce("has_clean_bat", F.lit(False)))
        .withColumn("has_clean_bowl", F.coalesce("has_clean_bowl", F.lit(False)))
    )


MATCH_BUCKETS = 256


def match_bucket_col():
    """Partition key of the on-disk partials tables: a hash bucket of
    the match id (``xxhash64(match) % 256``). Partitioning partials BY
    MATCH (the r7/r8 layout) costs O(#matches) directories, and a
    hive file index lists every directory before pruning — measured r9
    (SCALE.md): at 4000 matches each full partials read paid ~8-12 s
    of pure listing (the table held 8k rows), 5.5× the whole 1×
    per-batch cost, and compaction couldn't help because bootstrap
    already writes ~1 file per dir. Bucketing bounds the directory
    count at 256 forever; the replace unit coarsens from match to
    bucket, which ``write_partials`` preserves by carrying sibling
    matches' rows through every scoped rewrite (skinny rows — partials
    are O(keys) per match, so a bucket rewrite is O(matches/256 ×
    keys), never O(deliveries))."""
    return F.pmod(F.xxhash64(F.col("match")), F.lit(MATCH_BUCKETS)).cast("int")


class StalePartialsLayout(ValueError):
    """A stored partials table predates the r9 bucketed layout (it is
    partitioned by ``match``, carries no ``mbucket`` column). A scoped
    bucket rewrite cannot be expressed against it — and writing bucket
    partitions next to match partitions would leave a mixed-scheme dir
    no reader can load. Callers catch this and route to their
    bootstrap branch: the STATIC full refresh both rebuilds the state
    and migrates the layout in one authoritative write."""


def with_match_tombstones(pdf: DataFrame, matches: DataFrame) -> DataFrame:
    """Union one null-key tombstone row per affected match into a
    partials frame (`matches`: single column ``match``). Dynamic
    partition overwrite replaces only the partitions PRESENT in the
    written frame — so a rescraped match whose new scrape yields zero
    partial rows for a builder (e.g. every batsman became the N/A
    sentinel) would silently keep its stale rows. The tombstone
    guarantees every affected match's bucket partition is rewritten
    (possibly to just the tombstone plus its sibling matches' rows);
    finishers ignore tombstones by construction: key columns are null
    (batch keys pass not_na, never null) and presence flags are False.
    Repeated rescrapes cannot accumulate tombstones: the sibling
    read-back in ``write_partials`` anti-joins the affected matches,
    which drops an affected match's previous tombstone before the new
    one lands — at most one per match ever rescraped."""
    cols = []
    for f in pdf.schema.fields:
        if f.name == "match":
            cols.append(F.col("match"))
        elif f.dataType.typeName() == "boolean":
            cols.append(F.lit(False).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return pdf.unionByName(matches.select(*cols))


def write_partials(
    pdf: DataFrame,
    ppath: str,
    scoped: bool,
    fmt: str,
    affected_matches: DataFrame | None = None,
) -> None:
    """The ONE write policy for a partials table, shared by the
    streaming branch and the CLI so the two cannot drift (r8). Layout
    (r9): hash-bucketed by ``match_bucket_col()`` — 256 directories at
    any match count (see its docstring for the measured O(#dirs)
    listing cliff this bounds).

    - ``scoped`` (a rescrape's affected matches, tombstones already
      applied; requires ``affected_matches``): the replace unit is the
      match BUCKET — the affected buckets' frame is the new partials
      UNIONed with the read-back rows of every sibling match sharing
      those buckets (anti-joined on the affected matches, which also
      retires their previous tombstones), then a dynamic partition
      overwrite. Buckets outside the affected set stay untouched
      byte-for-byte; sibling rows inside them are rewritten with
      identical content.
    - full bootstrap/refresh: STATIC overwrite — the rebuild is
      authoritative, and a dynamic write would resurrect the bucket
      of any match retracted from silver since the state being
      overwritten was written (stale-gold hazard; includes the
      crash-debris case, where the existence probe routes to
      re-bootstrap over a half-written table whose matches may no
      longer all exist).

    On parquet, stamps the commit marker the existence probe relies on
    (partitioned writes leave no root _SUCCESS)."""
    from aws_ipl_data_pipeline_spark.sources.readers import read_table
    from aws_ipl_data_pipeline_spark.sources.writers import (
        mark_success,
        overwrite_table,
        write_partitioned,
    )

    spark = pdf.sparkSession
    if "mbucket" in pdf.columns:  # a builder column would be silently shadowed
        raise ValueError("partials builders must not emit a column named mbucket")
    pdf = pdf.withColumn("mbucket", match_bucket_col())
    if scoped:
        if affected_matches is None:
            raise ValueError("scoped write_partials requires affected_matches")
        # bounded driver collect: one int per affected match (the same
        # sanctioned class as the affected-match-id collects upstream);
        # literal IN list so the bucket scan partition-prunes
        buckets = [
            r[0]
            for r in affected_matches.select(match_bucket_col().alias("b"))
            .distinct()
            .collect()
        ]
        old = read_table(spark, ppath, fmt=fmt)
        if "mbucket" not in old.columns:  # pre-r9 per-match layout on disk
            raise StalePartialsLayout(
                f"{ppath} uses the pre-r9 per-match partials layout; "
                "re-bootstrap (full refresh) to migrate to bucketed partitions"
            )
        siblings = (
            old.where(F.col("mbucket").isin(buckets))
            .join(affected_matches, "match", "left_anti")
        )
        # eager checkpoint: the union reads the very partitions the
        # write below replaces — without cutting lineage the overwrite
        # would consume its own output path
        pdf = pdf.unionByName(siblings).localCheckpoint(eager=True)
        write_partitioned(
            pdf, ppath, partition_by=["mbucket"], mode="overwrite", fmt=fmt
        )
    else:
        overwrite_table(pdf, ppath, partition_by=["mbucket"], fmt=fmt)
    if fmt == "parquet":
        mark_success(spark, ppath)


# --------------------------------------------------------------------------
# finishers: merge partials per key, then the SHARED ratio/rank stages
# --------------------------------------------------------------------------


def batsman_stats_from_partials(p: DataFrame) -> DataFrame:
    """gold_batsman_stats from (match, batsman) partials — equal to
    plans.gold.batsman_stats(silver) by construction: integer sums of
    sums, countDistinct(match) ≡ count of batted partial rows,
    max-of-sum ≡ max over per-match sums; ratios in _finish_batsman."""
    pb = p.where("batted")
    highest = pb.groupBy("batsman").agg(F.max("match_runs").alias("highest_score"))
    stats = pb.groupBy("batsman").agg(
        F.count("*").alias("matches"),
        F.sum("match_runs").alias("total_runs"),
        F.sum("legal_balls").alias("legal_balls"),
        F.sum("fours").alias("fours"),
        F.sum("sixes").alias("sixes"),
        F.sum("dot_balls").alias("dot_balls"),
    )
    outs = (
        p.where(F.col("times_out").isNotNull())
        .groupBy("batsman")
        .agg(F.sum("times_out").alias("times_out"))
    )
    return _finish_batsman(stats, highest, outs)


def bowler_stats_from_partials(p: DataFrame) -> DataFrame:
    # the isNotNull guard drops match tombstones (batch partials never
    # carry a null bowler — not_na filters nulls upstream)
    stats = p.where(F.col("bowler").isNotNull()).groupBy("bowler").agg(
        F.count("*").alias("matches"),
        F.sum("total_runs_conceded").alias("total_runs_conceded"),
        F.sum("legal_balls").alias("legal_balls"),
        F.sum("wickets").alias("wickets"),
        F.sum("dot_balls").alias("dot_balls"),
        F.sum("fours_conceded").alias("fours_conceded"),
        F.sum("sixes_conceded").alias("sixes_conceded"),
    )
    return _finish_bowler(stats)


def team_stats_from_partials(p: DataFrame) -> DataFrame:
    pb = p.where("has_bat")
    stats = pb.groupBy("team").agg(
        F.count("*").alias("matches"),
        F.sum("total_runs").alias("total_runs"),
        F.sum("wickets_lost").alias("total_wickets_lost"),
        F.sum("legal_balls").alias("legal_balls"),
        F.sum("fours").alias("fours"),
        F.sum("sixes").alias("sixes"),
        F.sum("pp_runs").alias("_pp_runs"),
        F.sum("pp_balls").alias("_pp_balls"),
    )
    return _finish_team(stats)


def tournament_standings_from_partials(p: DataFrame) -> DataFrame:
    bat = p.where("has_clean_bat").select(
        "match", "team", "runs_scored", "legal_balls_batted"
    )
    bowl = p.where("has_clean_bowl").select(
        "match", "team", "runs_conceded", "legal_balls_bowled"
    )
    all_teams = bat.select("team").distinct()
    return _finish_standings(bat, bowl, all_teams)


PARTIAL_BUILDERS = {
    "batsman": batsman_match_partials,
    "bowler": bowler_match_partials,
    "team": team_match_partials,
}

GOLD_FROM_PARTIALS = {
    "gold_batsman_stats": ("batsman", batsman_stats_from_partials),
    "gold_bowler_stats": ("bowler", bowler_stats_from_partials),
    "gold_team_stats": ("team", team_stats_from_partials),
    "gold_tournament_standings": ("team", tournament_standings_from_partials),
}
