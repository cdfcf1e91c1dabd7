"""Hand-built golden IPL fixture (FIXTURES.md §A): 3 matches covering
the cricket-specific semantics — extras parsing incl. '5 wides',
runs-off-extras from commentary, wickets, innings detection incl. a
super over (innings 3/4), a tied match, toss 'field' decision, fuzzy
name typos, duplicate scraped rows.

Hand-computed expectations live in the tests that consume this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_ipl_data_pipeline_spark.schemas import MATCH_META, PLAYERS, RAW_DELIVERIES

AA, BB, CC = "Alpha XI", "Bravo XI", "Charlie XI"

PLAYERS_ROWS = [
    ("Arjun Sharma", AA), ("Amit Patel", AA), ("Ankit Verma", AA),
    ("Bharat Rao", BB), ("Bala Iyer", BB), ("Bhuvan Das", BB),
    ("Chetan Kumar", CC), ("Chirag Mehta", CC), ("Charan Singh", CC),
]

META_ROWS = [
    # match, short_name, home, away, date, time, venue, toss_winner, toss_decision
    ("Match 1", "01_AAvsBB", AA, BB, "Apr 01", "7:30", "Alpha Stadium", AA, "bat"),
    ("Match 2", "02_AAvsCC", AA, CC, "Apr 02", "7:30", "Charlie Ground", "Charli XI", "field"),
    ("Match 3", "03_BBvsCC", BB, CC, "Apr 03", "7:30", "Bravo Park", BB, "bat"),
]


def _ts(i: int) -> str:
    return f"2026-04-01 19:00:{i:02d}.000000"


def _ball(match, over, ball, bowler, batsman, event, info, seq):
    return (match, "Apr 01", "7:30", "V", over, ball, bowler, batsman, event, info, _ts(seq))


RAW_ROWS = [
    # ---- Match 1, innings 1: AA bat (21 runs, 6 legal balls, 1 wicket)
    _ball("01_AAvsBB", 0, 1, "Bharat Rao", "Arjun Sharm", "four", "", 1),
    _ball("01_AAvsBB", 0, 2, "Bharat Rao", "Arjun Sharm", "wide", "1 run; down leg", 2),
    _ball("01_AAvsBB", 0, 2, "Bharat Rao", "Amit Pattel", "no run", "", 3),
    _ball("01_AAvsBB", 0, 3, "Bharat Rao", "Amit Pattel", "5 wides", "swings away", 4),
    _ball("01_AAvsBB", 0, 3, "Bharat Rao", "Amit Pattel", "byes", "2 runs; past keeper", 5),
    _ball("01_AAvsBB", 0, 4, "Bharat Rao", "Amit Pattel", "out Bowled Middle stump!", "", 6),
    _ball("01_AAvsBB", 0, 5, "Bharat Rao", "Ankit Verma", "six", "over long on", 7),
    _ball("01_AAvsBB", 0, 6, "Bharat Rao", "Ankit Verma", "no ball", "no run", 8),
    _ball("01_AAvsBB", 0, 6, "Bharat Rao", "Ankit Verma", "1 run", "", 9),
    # exact duplicate of the previous row (re-scrape overlap)
    _ball("01_AAvsBB", 0, 6, "Bharat Rao", "Ankit Verma", "1 run", "", 9),
    # ---- Match 1, innings 2: BB bat (13 runs, 6 legal balls, 1 wicket)
    _ball("01_AAvsBB", 0, 1, "Arjun Sharmaa", "Bharat Raoo", "2 runs", "", 11),
    _ball("01_AAvsBB", 0, 2, "Arjun Sharmaa", "Bharat Raoo", "four", "", 12),
    _ball("01_AAvsBB", 0, 3, "Arjun Sharmaa", "Bharat Raoo", "out Caught at mid on", "", 13),
    _ball("01_AAvsBB", 0, 4, "Arjun Sharmaa", "Bala Iyer", "six", "", 14),
    _ball("01_AAvsBB", 0, 5, "Arjun Sharmaa", "Bala Iyer", "1 run", "", 15),
    _ball("01_AAvsBB", 0, 6, "Arjun Sharmaa", "Bala Iyer", "no run", "", 16),
    # ---- Match 2 (tie, toss 'field' by Charlie): innings 1 AA bat (6)
    _ball("02_AAvsCC", 0, 1, "Chetan Kumar", "Arjun Sharma", "1 run", "", 1),
    _ball("02_AAvsCC", 0, 2, "Chetan Kumar", "Arjun Sharma", "four", "", 2),
    _ball("02_AAvsCC", 0, 3, "Chetan Kumar", "Amit Patel", "1 run", "", 3),
    # innings 2 CC bat (6)
    _ball("02_AAvsCC", 0, 1, "Amit Patel", "Chirag Mehta", "four", "", 4),
    _ball("02_AAvsCC", 0, 2, "Amit Patel", "Chirag Mehta", "2 runs", "", 5),
    _ball("02_AAvsCC", 0, 3, "Amit Patel", "Chirag Mehta", "no run", "", 6),
    # ---- Match 3 (super over): innings 1 BB bat (6)
    _ball("03_BBvsCC", 0, 1, "Charan Singh", "Bala Iyer", "four", "", 1),
    _ball("03_BBvsCC", 0, 2, "Charan Singh", "Bala Iyer", "out Lbw plumb", "", 2),
    _ball("03_BBvsCC", 0, 3, "Charan Singh", "Bhuvan Das", "2 runs", "", 3),
    # innings 2 CC bat (6)
    _ball("03_BBvsCC", 0, 1, "Bhuvan Das", "Chetan Kumar", "six", "", 4),
    _ball("03_BBvsCC", 0, 2, "Bhuvan Das", "Chetan Kumar", "no run", "", 5),
    _ball("03_BBvsCC", 0, 3, "Bhuvan Das", "Chetan Kumar", "no run", "", 6),
    # innings 3 (super over, BB bat): 2
    _ball("03_BBvsCC", 0, 1, "Chetan Kumar", "Bala Iyer", "1 run", "", 7),
    _ball("03_BBvsCC", 0, 2, "Chetan Kumar", "Bhuvan Das", "1 run", "", 8),
    # innings 4 (super over, CC bat): 4
    _ball("03_BBvsCC", 0, 1, "Bala Iyer", "Chirag Mehta", "four", "", 9),
]


def raw_deliveries(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RAW_ROWS, schema=RAW_DELIVERIES)


def match_meta(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(META_ROWS, schema=MATCH_META)


def players(spark: SparkSession) -> DataFrame:
    rows = [
        (n, t, "India", "Batter", False, None, None, None) for n, t in PLAYERS_ROWS
    ]
    return spark.createDataFrame(rows, schema=PLAYERS)
