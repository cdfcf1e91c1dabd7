"""Golden-output tests for the IPL medallion plans (SURVEY §5):
hand-computed expectations over tests/fixtures_ipl.py."""

from __future__ import annotations

import pytest

from aws_ipl_data_pipeline_spark.plans import (
    batsman_stats,
    bowler_stats,
    team_stats,
    to_bronze,
    to_silver,
    tournament_standings,
)
from tests.fixtures_ipl import AA, BB, CC, match_meta, players, raw_deliveries


@pytest.fixture(scope="module")
def bronze(spark):
    df = to_bronze(raw_deliveries(spark))
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def silver(spark, bronze):
    df = to_silver(bronze, match_meta(spark), players(spark))
    df.cache().count()
    return df


def _rows(df, **filters):
    for k, v in filters.items():
        df = df.where(df[k] == v)
    return [r.asDict() for r in df.collect()]


# ---------------------------------------------------------------- bronze


def test_event_parse_five_wides(bronze):
    """'5 wides' special case: runs=4, extra_runs=1, type wide, rebowl
    (reference ex_match_rb.py:87-92)."""
    [r] = _rows(bronze, match="01_AAvsBB", extract_time="2026-04-01 19:00:04.000000")
    assert (r["runs"], r["extra_runs"], r["extra_type"], r["rebowl"], r["total_runs"]) == (
        4, 1, "wide", 1, 5
    )


def test_event_parse_runs_off_extras(bronze):
    """wide/byes take runs from the first ';'-token of commentary
    (reference ex_match_rb.py:83-85)."""
    [wide] = _rows(bronze, match="01_AAvsBB", extract_time="2026-04-01 19:00:02.000000")
    assert (wide["runs"], wide["extra_runs"], wide["total_runs"], wide["rebowl"]) == (1, 1, 2, 1)
    [byes] = _rows(bronze, match="01_AAvsBB", extract_time="2026-04-01 19:00:05.000000")
    assert (byes["runs"], byes["extra_runs"], byes["extra"], byes["rebowl"]) == (2, 0, 1, 0)


def test_event_parse_wicket(bronze):
    """Effective reference behavior: method = 2nd token, out_batsman =
    striker (the 'Run Out!' branch is dead code, ex_match_rb.py:96)."""
    [r] = _rows(bronze, match="01_AAvsBB", extract_time="2026-04-01 19:00:06.000000")
    assert (r["wicket"], r["wicket_method"], r["out_batsman"]) == (1, "bowled", "Amit Pattel")


def test_dedupe_before_fold(bronze):
    assert bronze.where(bronze.match == "01_AAvsBB").count() == 15  # 16 raw - 1 dup


def test_innings_detection_and_super_over(bronze):
    inns = {
        r["extract_time"]: r["innings"]
        for r in _rows(bronze, match="03_BBvsCC")
    }
    assert inns["2026-04-01 19:00:01.000000"] == 1
    assert inns["2026-04-01 19:00:04.000000"] == 2
    assert inns["2026-04-01 19:00:07.000000"] == 3  # super over
    assert inns["2026-04-01 19:00:09.000000"] == 4


def test_running_score_local_semantics(bronze):
    """score seeds with the first ball's runs (local pipeline semantics,
    brnz_match.py:112-124; cloud's reset-to-0 divergence documented)."""
    m1 = sorted(_rows(bronze, match="01_AAvsBB", innings=1), key=lambda r: r["extract_time"])
    assert [r["score"] for r in m1] == [4, 6, 6, 11, 13, 13, 19, 20, 21]
    assert [r["fallen_wickets"] for r in m1] == [0, 0, 0, 0, 0, 1, 1, 1, 1]
    m1b = sorted(_rows(bronze, match="01_AAvsBB", innings=2), key=lambda r: r["extract_time"])
    assert [r["score"] for r in m1b] == [2, 6, 6, 12, 13, 13]


# ---------------------------------------------------------------- silver


def test_team_assignment_toss_bat(silver):
    r = _rows(silver, match="01_AAvsBB", innings=1)[0]
    assert (r["batting_team"], r["bowling_team"]) == (AA, BB)
    r2 = _rows(silver, match="01_AAvsBB", innings=2)[0]
    assert (r2["batting_team"], r2["bowling_team"]) == (BB, AA)


def test_team_assignment_toss_field_with_fuzzy_winner(silver):
    """'Charli XI' fuzzy-resolves to Charlie XI; decision 'field' means
    the toss loser bats first (reference ex_match_bs.py:225-237)."""
    r = _rows(silver, match="02_AAvsCC", innings=1)[0]
    assert (r["batting_team"], r["bowling_team"]) == (AA, CC)


def test_super_over_parity(silver):
    assert _rows(silver, match="03_BBvsCC", innings=3)[0]["batting_team"] == BB
    assert _rows(silver, match="03_BBvsCC", innings=4)[0]["batting_team"] == CC


def test_fuzzy_name_normalization(silver):
    names = {r["batsman"] for r in _rows(silver, match="01_AAvsBB", innings=1)}
    assert "Arjun Sharma" in names and "Amit Patel" in names
    assert "Arjun Sharm" not in names and "Amit Pattel" not in names
    outs = {r["out_batsman"] for r in _rows(silver, match="01_AAvsBB", innings=1)}
    assert "Amit Patel" in outs
    bowlers = {r["bowler"] for r in _rows(silver, match="01_AAvsBB", innings=2)}
    assert bowlers == {"Arjun Sharma"}


def test_silver_flags_and_phase(silver):
    [wide] = [
        r for r in _rows(silver, match="01_AAvsBB", innings=1) if r["extra_type"] == "wide" and r["extra_runs"] == 1 and r["runs"] == 1
    ]
    assert wide["is_legal_delivery"] == 0
    [byes] = [r for r in _rows(silver, match="01_AAvsBB") if r["extra_type"] == "byes"]
    assert byes["is_legal_delivery"] == 1  # byes count as legal
    r = _rows(silver, match="01_AAvsBB", innings=1)[0]
    assert r["innings_phase"] == "Powerplay" and r["venue"] == "Alpha Stadium"
    four = [x for x in _rows(silver, match="01_AAvsBB", innings=1) if x["runs"] == 4 and x["extra"] == 0]
    assert four[0]["is_four"] == 1 and four[0]["is_boundary"] == 1


def test_silver_keyed_dedupe(silver):
    """Natural key (match, innings, over, ball, rebowl): the wide at
    0.2 (rebowl=1) and the legal 0.2 (rebowl=0) both survive."""
    n = silver.where(
        (silver.match == "01_AAvsBB") & (silver.innings == 1) & (silver.over == 0) & (silver.ball == 2)
    ).count()
    assert n == 2


# ---------------------------------------------------------------- gold


def test_batsman_stats_golden(spark, silver):
    bs = {r["batsman"]: r.asDict() for r in batsman_stats(silver).collect()}
    arjun = bs["Arjun Sharma"]
    # M1: four(4) + wide bat-run(1); M2: 1 + 4 → total 10; M1 legal: 1, M2: 2
    assert arjun["total_runs"] == 10 and arjun["matches"] == 2
    assert arjun["legal_balls"] == 3 and arjun["times_out"] == 0
    assert arjun["highest_score"] == 5
    # strike_rate = 10*100/3 = 333.33; batting_avg guard: /1 when never out
    assert arjun["strike_rate"] == 333.33 and arjun["batting_avg"] == 10.0
    amit = bs["Amit Patel"]
    # M1: no run(0)+5 wides(4)+byes(2 bat runs)+out(0) = 6; M2: 1 → 7
    assert amit["total_runs"] == 7 and amit["times_out"] == 1


def test_bowler_stats_golden(silver):
    bw = {r["bowler"]: r.asDict() for r in bowler_stats(silver).collect()}
    rao = bw["Bharat Rao"]
    # M1 inn1: conceded = 21 total; legal 6; wickets 1; overs 6 balls = 1.0
    assert rao["total_runs_conceded"] == 21 and rao["legal_balls"] == 6
    assert rao["wickets"] == 1 and rao["overs_bowled"] == 1.0
    assert rao["economy_rate"] == 21.0  # 21 / (6/6)
    chetan = bw["Chetan Kumar"]
    # M2 inn1 (6 runs, 3 legal) + M3 inn3 (2 runs, 2 legal)
    assert chetan["total_runs_conceded"] == 8 and chetan["legal_balls"] == 5
    assert chetan["overs_bowled"] == 0.5  # 5 balls → 0.5 in overs notation


def test_team_stats_golden(silver):
    ts = {r["team"]: r.asDict() for r in team_stats(silver).collect()}
    aa = ts[AA]
    assert aa["total_runs"] == 27 and aa["matches"] == 2 and aa["legal_balls"] == 9
    assert aa["overs_batted"] == 1.3  # 9 balls = 1 over + 3
    assert aa["overall_run_rate"] == 18.0  # 27/(9/6)
    assert aa["pp_run_rate"] == 18.0  # everything is powerplay here
    assert ts[BB]["total_runs"] == 21 and ts[CC]["total_runs"] == 16


def test_tournament_standings_golden(silver):
    st = {r["team"]: r.asDict() for r in tournament_standings(silver).collect()}
    aa, bb, cc = st[AA], st[BB], st[CC]
    # M2 is a tie → contributes to NOBODY (reference quirk: tie rows have
    # null winner/loser so the tie counter never matches, ex_match_sg.py:257)
    assert (aa["won"], aa["lost"], aa["tied_nr"], aa["played"], aa["points"]) == (1, 0, 0, 1, 2)
    assert (bb["won"], bb["lost"], bb["points"]) == (0, 2, 0)
    assert (cc["won"], cc["lost"], cc["points"]) == (1, 0, 2)
    assert (aa["runs_for"], aa["runs_against"]) == (27, 19)
    assert (bb["runs_for"], bb["runs_against"]) == (21, 31)
    assert (cc["runs_for"], cc["runs_against"]) == (16, 14)
    # NRR from ROUNDED rates (reference :273-275)
    assert aa["avg_run_rate"] == 18.0 and aa["net_run_rate"] == 5.33  # 18.0 - 12.67
    assert aa["overs_for"] == 1.3 and aa["overs_against"] == 1.3
    # rank: AA (p2, nrr 5.33) > CC (p2, nrr ...) > BB (p0)
    assert (aa["rank"], cc["rank"], bb["rank"]) == (1, 2, 3)
