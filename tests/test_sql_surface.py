"""The reference's two documented Athena queries must run VERBATIM
through spark.sql and agree with the DataFrame-API gold plans."""

from __future__ import annotations

import pytest

from aws_ipl_data_pipeline_spark.plans import to_bronze, to_silver
from aws_ipl_data_pipeline_spark.sql_surface import (
    materialize_gold,
    orange_cap,
    points_table,
)
from tests.fixtures_ipl import match_meta, players, raw_deliveries


@pytest.fixture(scope="module")
def gold(spark, tmp_path_factory):
    silver = to_silver(to_bronze(raw_deliveries(spark)), match_meta(spark), players(spark))
    loc = str(tmp_path_factory.mktemp("warehouse"))
    return materialize_gold(spark, silver, location=loc)


def test_points_table_verbatim(spark, gold):
    got = [tuple(r) for r in points_table(spark).collect()]
    want = [
        tuple(r)
        for r in gold["gold_tournament_standings"]
        .select("rank", "team", "played", "won", "lost", "points", "net_run_rate", "avg_run_rate")
        .orderBy("rank")
        .collect()
    ]
    assert got == want and len(got) == 3


def test_orange_cap_verbatim(spark, gold):
    got = [tuple(r) for r in orange_cap(spark).collect()]
    assert len(got) > 0
    # leader by total_runs matches the DataFrame plan's leader
    df_leader = (
        gold["gold_batsman_stats"].orderBy("total_runs", ascending=False).head()
    )
    assert got[0][0] == df_leader["batsman"] and got[0][1] == df_leader["total_runs"]
