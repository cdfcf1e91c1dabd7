"""IPL medallion semantics in the driver correctness gate.

The synthetic harness tables have no cricket data, so these queries run
the REAL medallion plans over literal VALUES fixtures and check them
against independently hand-written SQL oracles implementing the
reference semantics (reference pipeline_2026/ex_match_rb.py:44-154,
ex_match_sg.py:210-297). The fixture literals are defined once and
rendered into both sides, so only the computations differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_ipl_data_pipeline_spark.queries import register
from aws_ipl_data_pipeline_spark.schemas import RAW_DELIVERIES
from aws_ipl_data_pipeline_spark.session import tune_session

# ---------------------------------------------------------------------------
# fixture literals (shared by Spark createDataFrame and SQL VALUES)
# ---------------------------------------------------------------------------

# (match, over, ball, bowler, batsman, ball_event, event_info, seq)
RAW_BALLS = [
    ("M1", 0, 1, "bw1", "bat1", "four", "", 1),
    ("M1", 0, 2, "bw1", "bat1", "wide", "1 run; down leg", 2),
    ("M1", 0, 2, "bw1", "bat2", "no run", "", 3),
    ("M1", 0, 3, "bw1", "bat2", "5 wides", "swings", 4),
    ("M1", 0, 3, "bw1", "bat2", "byes", "2 runs; past keeper", 5),
    ("M1", 0, 4, "bw1", "bat2", "out Bowled !", "", 6),
    ("M1", 0, 5, "bw1", "bat3", "six", "", 7),
    ("M1", 0, 6, "bw1", "bat3", "no ball", "no run", 8),
    ("M1", 0, 6, "bw1", "bat3", "1 run", "", 9),
    ("M1", 0, 1, "bw2", "bat4", "2 runs", "", 10),  # innings 2
    ("M1", 0, 2, "bw2", "bat4", "leg byes", "1 run; off pads", 11),
    ("M1", 0, 3, "bw2", "bat4", "out Caught !", "", 12),
    ("M2", 0, 1, "bw3", "bat1", "3 runs", "", 1),
    ("M2", 0, 2, "bw3", "bat1", "no-ball", "four", 2),
    ("M2", 0, 2, "bw3", "bat1", "1 run", "", 3),
]


def _raw_values_sql() -> str:
    rows = ",\n      ".join(
        f"('{m}', {o}, {b}, '{bw}', '{bt}', '{ev}', '{info}', {seq})"
        for (m, o, b, bw, bt, ev, info, seq) in RAW_BALLS
    )
    return (
        f"(VALUES\n      {rows}\n    ) AS raw(match, over_, ball, bowler, batsman, ball_event, event_info, seq)"
    )


def _raw_df(spark: SparkSession) -> DataFrame:
    rows = [
        (m, "Apr 01", "7:30", "V", o, b, bw, bt, ev, info, f"t{seq:04d}")
        for (m, o, b, bw, bt, ev, info, seq) in RAW_BALLS
    ]
    return spark.createDataFrame(rows, schema=RAW_DELIVERIES)


# SQL implementation of the reference event parse + innings fold,
# derived directly from ex_match_rb.py:44-154 (independent of the Spark
# plan under test).
_PARSE_SQL = """
    parsed AS (
      SELECT match, over_, ball, bowler, batsman, seq,
        lower(ball_event) AS ev, lower(event_info) AS info,
        CASE lower(ball_event)
          WHEN 'no run' THEN 0 WHEN '1 run' THEN 1 WHEN '2 runs' THEN 2
          WHEN '3 runs' THEN 3 WHEN 'four' THEN 4 WHEN '5 runs' THEN 5
          WHEN 'six' THEN 6 ELSE 0 END AS base_runs,
        lower(ball_event) IN ('wide','no ball','no-ball','byes','leg byes','leg-byes') AS is_extra,
        lower(ball_event) = '5 wides' AS is_5w,
        lower(ball_event) LIKE 'out%' AS is_out,
        CASE lower(ball_event) WHEN 'wide' THEN 1 WHEN 'no ball' THEN 1
          WHEN 'no-ball' THEN 1 ELSE 0 END AS extra_val,
        string_split(lower(event_info), ';')[1] AS extra_event
      FROM {raw}
    ),
    fields AS (
      SELECT match, over_, ball, bowler, batsman, seq,
        CASE WHEN is_extra AND extra_event IN ('no run','1 run','2 runs','3 runs','four','5 runs','six')
               THEN CASE extra_event WHEN 'no run' THEN 0 WHEN '1 run' THEN 1
                    WHEN '2 runs' THEN 2 WHEN '3 runs' THEN 3 WHEN 'four' THEN 4
                    WHEN '5 runs' THEN 5 WHEN 'six' THEN 6 END
             WHEN is_5w THEN 4 ELSE base_runs END AS runs,
        CASE WHEN is_extra THEN extra_val WHEN is_5w THEN 1 ELSE 0 END AS extra_runs,
        CASE WHEN is_extra OR is_5w THEN 1 ELSE 0 END AS extra,
        CASE WHEN is_extra THEN ev WHEN is_5w THEN 'wide' ELSE 'N/A' END AS extra_type,
        CASE WHEN is_extra THEN extra_val WHEN is_5w THEN 1 ELSE 0 END AS rebowl,
        CASE WHEN is_out THEN 1 ELSE 0 END AS wicket,
        CASE WHEN is_out THEN string_split(ev, ' ')[2] ELSE 'Not Out' END AS wicket_method,
        CASE WHEN is_out THEN batsman ELSE 'N/A' END AS out_batsman
      FROM parsed
    ),
    with_total AS (
      SELECT *, runs + extra_runs AS total_runs FROM fields
    ),
    lagged AS (
      SELECT *, lag(rebowl) OVER (PARTITION BY match ORDER BY seq) AS prev_rebowl
      FROM with_total
    ),
    folded AS (
      SELECT *,
        1 + SUM(CASE WHEN over_ = 0 AND ball = 1 AND prev_rebowl = 0
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY match ORDER BY seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS innings
      FROM lagged
    )
"""


@register(
    "ipl_bronze_fold",
    f"""
    WITH {_PARSE_SQL.format(raw=_raw_values_sql())}
    SELECT match, CAST(over_ AS BIGINT) AS over, CAST(ball AS BIGINT) AS ball,
           bowler, batsman,
           CAST(runs AS BIGINT) AS runs, CAST(extra_runs AS BIGINT) AS extra_runs,
           CAST(extra AS BIGINT) AS extra, extra_type,
           CAST(rebowl AS BIGINT) AS rebowl, CAST(wicket AS BIGINT) AS wicket,
           wicket_method, out_batsman,
           CAST(total_runs AS BIGINT) AS total_runs,
           CAST(innings AS BIGINT) AS innings,
           CAST(SUM(total_runs) OVER (PARTITION BY match, innings ORDER BY seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS score,
           CAST(SUM(wicket) OVER (PARTITION BY match, innings ORDER BY seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fallen_wickets
    FROM folded
    """,
)
def ipl_bronze_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4+A12+W2/W3: the full bronze plan (event parse + innings
    detection + running score) on the literal fixture, vs a hand-written
    SQL derivation of reference ex_match_rb.py:44-154."""
    from aws_ipl_data_pipeline_spark.plans.bronze import to_bronze

    tune_session(spark)
    bronze = to_bronze(_raw_df(spark))
    return bronze.select(
        "match",
        F.col("over").cast("long"),
        F.col("ball").cast("long"),
        "bowler",
        "batsman",
        F.col("runs").cast("long"),
        F.col("extra_runs").cast("long"),
        F.col("extra").cast("long"),
        "extra_type",
        F.col("rebowl").cast("long"),
        F.col("wicket").cast("long"),
        "wicket_method",
        "out_batsman",
        F.col("total_runs").cast("long"),
        F.col("innings").cast("long"),
        F.col("score").cast("long"),
        F.col("fallen_wickets").cast("long"),
    )


# (match, batting_team, bowling_team, total_runs, is_legal) — silver-ish
SILVER_ROWS = [
    ("M1", "AA", "BB", 4, 1), ("M1", "AA", "BB", 2, 0), ("M1", "AA", "BB", 5, 0),
    ("M1", "AA", "BB", 2, 1), ("M1", "AA", "BB", 6, 1), ("M1", "AA", "BB", 1, 1),
    ("M1", "BB", "AA", 2, 1), ("M1", "BB", "AA", 1, 1), ("M1", "BB", "AA", 0, 1),
    ("M2", "AA", "CC", 6, 1), ("M2", "AA", "CC", 0, 1),
    ("M2", "CC", "AA", 6, 1), ("M2", "CC", "AA", 0, 1),  # tie
    ("M3", "BB", "CC", 4, 1), ("M3", "BB", "CC", 1, 1),
    ("M3", "CC", "BB", 2, 1), ("M3", "CC", "BB", 6, 0),
]


def _silver_values_sql() -> str:
    rows = ",\n      ".join(
        f"('{m}', '{bt}', '{bw}', {r}, {lg})" for (m, bt, bw, r, lg) in SILVER_ROWS
    )
    return (
        f"(VALUES\n      {rows}\n    ) AS s(match, batting_team, bowling_team, total_runs, is_legal_delivery)"
    )


def _silver_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        SILVER_ROWS,
        "match string, batting_team string, bowling_team string, "
        "total_runs int, is_legal_delivery int",
    )


@register(
    "ipl_standings",
    f"""
    WITH silver AS (SELECT * FROM {_silver_values_sql()}),
    bat AS (
      SELECT match, batting_team AS team, SUM(total_runs) AS runs_scored,
             SUM(is_legal_delivery) AS balls_batted
      FROM silver GROUP BY 1, 2
    ),
    bowl AS (
      SELECT match, bowling_team AS team, SUM(total_runs) AS runs_conceded,
             SUM(is_legal_delivery) AS balls_bowled
      FROM silver GROUP BY 1, 2
    ),
    ms AS (
      SELECT COALESCE(bat.match, bowl.match) AS match,
             COALESCE(bat.team, bowl.team) AS team,
             COALESCE(runs_scored, 0) AS runs_scored,
             COALESCE(balls_batted, 0) AS balls_batted,
             COALESCE(runs_conceded, 0) AS runs_conceded,
             COALESCE(balls_bowled, 0) AS balls_bowled
      FROM bat FULL OUTER JOIN bowl ON bat.match = bowl.match AND bat.team = bowl.team
    ),
    pm AS (
      SELECT match, COUNT(*) AS n_teams, MAX(runs_scored) AS mx, MIN(runs_scored) AS mn,
             max_by(team, runs_scored) AS mx_team, min_by(team, runs_scored) AS mn_team
      FROM bat GROUP BY match
    ),
    winners AS (
      SELECT match,
             CASE WHEN mx > mn THEN mx_team END AS winner,
             CASE WHEN mx > mn THEN mn_team END AS loser
      FROM pm WHERE n_teams = 2
    ),
    outcomes AS (
      SELECT team, SUM(w) AS won, SUM(l) AS lost FROM (
        SELECT winner AS team, 1 AS w, 0 AS l FROM winners WHERE winner IS NOT NULL
        UNION ALL
        SELECT loser AS team, 0 AS w, 1 AS l FROM winners WHERE loser IS NOT NULL
      ) GROUP BY team
    ),
    totals AS (
      SELECT team, SUM(runs_scored) AS runs_for, SUM(balls_batted) AS balls_for,
             SUM(runs_conceded) AS runs_against, SUM(balls_bowled) AS balls_against
      FROM ms GROUP BY team
    ),
    st AS (
      SELECT t.team,
             COALESCE(o.won, 0) AS won, COALESCE(o.lost, 0) AS lost,
             0 AS tied_nr,
             COALESCE(o.won, 0) + COALESCE(o.lost, 0) AS played,
             COALESCE(o.won, 0) * 2 AS points,
             t.runs_for, t.balls_for, t.runs_against, t.balls_against,
             CASE WHEN t.balls_for > 0 THEN round(t.runs_for / (t.balls_for / 6.0), 2) ELSE 0.0 END AS avg_run_rate,
             CASE WHEN t.balls_against > 0 THEN round(t.runs_against / (t.balls_against / 6.0), 2) ELSE 0.0 END AS conceded_rr
      FROM totals t LEFT JOIN outcomes o ON o.team = t.team
    )
    SELECT CAST(row_number() OVER (ORDER BY points DESC,
                round(avg_run_rate - conceded_rr, 3) DESC, avg_run_rate DESC, team ASC) AS BIGINT) AS rank,
           team, CAST(played AS BIGINT) AS played, CAST(won AS BIGINT) AS won,
           CAST(lost AS BIGINT) AS lost, CAST(tied_nr AS BIGINT) AS tied_nr,
           CAST(points AS BIGINT) AS points,
           round(avg_run_rate - conceded_rr, 3) AS net_run_rate,
           avg_run_rate,
           CAST(runs_for AS BIGINT) AS runs_for,
           round(CAST(balls_for // 6 + (balls_for % 6) / 10.0 AS DOUBLE), 1) AS overs_for,
           CAST(runs_against AS BIGINT) AS runs_against,
           round(CAST(balls_against // 6 + (balls_against % 6) / 10.0 AS DOUBLE), 1) AS overs_against
    FROM st
    """,
)
def ipl_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9/J3/W1/F2: the real tournament_standings plan on a literal
    silver fixture (incl. a tied match, which contributes to nothing —
    the reference quirk) vs an independent SQL derivation of
    ex_match_sg.py:210-297."""
    from aws_ipl_data_pipeline_spark.plans.gold import tournament_standings

    tune_session(spark)
    st = tournament_standings(_silver_df(spark))
    return st.select(
        F.col("rank").cast("long"),
        "team",
        F.col("played").cast("long"),
        F.col("won").cast("long"),
        F.col("lost").cast("long"),
        F.col("tied_nr").cast("long"),
        F.col("points").cast("long"),
        "net_run_rate",
        "avg_run_rate",
        "runs_for",
        "overs_for",
        "runs_against",
        "overs_against",
    )
