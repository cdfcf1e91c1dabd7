"""Incremental gold maintenance (plans/gold_incremental.py, ST4 at
100×): the partials-merge path must be indistinguishable from the
reference-parity full recompute — same tables from the batch builders,
and same tables out of a multi-batch incremental stream with an
overlapping rescrape."""

from __future__ import annotations

import csv
import os

import pytest

from aws_ipl_data_pipeline_spark.plans import to_bronze, to_silver
from aws_ipl_data_pipeline_spark.plans.gold import (
    batsman_stats,
    bowler_stats,
    team_stats,
    tournament_standings,
)
from aws_ipl_data_pipeline_spark.plans.gold_incremental import (
    GOLD_FROM_PARTIALS,
    PARTIAL_BUILDERS,
)
from aws_ipl_data_pipeline_spark.schemas import RAW_DELIVERIES
from aws_ipl_data_pipeline_spark.streaming import run_incremental_pipeline
from tests.fixtures_ipl import RAW_ROWS, match_meta, players, raw_deliveries

HEADER = [f.name for f in RAW_DELIVERIES.fields]

BATCH_BUILDERS = {
    "gold_batsman_stats": batsman_stats,
    "gold_bowler_stats": bowler_stats,
    "gold_team_stats": team_stats,
    "gold_tournament_standings": tournament_standings,
}


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.select(*cols).collect()
    )


def _write_csv(path: str, rows) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)


def test_partials_merge_equals_batch_builders(spark):
    """finisher(partials(silver)) ≡ builder(silver) for all four gold
    tables on the golden fixtures — the static half of batch ≡
    incremental."""
    silver = to_silver(
        to_bronze(raw_deliveries(spark)), match_meta(spark), players(spark)
    )
    partials = {n: b(silver) for n, b in PARTIAL_BUILDERS.items()}
    for name, (pname, finisher) in GOLD_FROM_PARTIALS.items():
        got = _canon(finisher(partials[pname]))
        want = _canon(BATCH_BUILDERS[name](silver))
        assert got == want, name


@pytest.mark.slow
def test_incremental_stream_gold_equals_batch(spark, tmp_path_factory):
    """Multi-batch incremental stream (gold_mode='incremental') with an
    overlapping match-1 rescrape: the final gold tables must equal the
    batch builders over the accumulated silver — including the stale-
    partial case (the rescrape's per-match REPLACE must not leave old
    partial rows behind)."""
    base = str(tmp_path_factory.mktemp("goldinc"))
    raw_dir = f"{base}/raw"
    by_match: dict[str, list] = {}
    for row in RAW_ROWS:
        by_match.setdefault(row[0], []).append(row)
    # split every match into 2-row files so availableNow (8 files per
    # trigger) must take several micro-batches
    for m, rows in by_match.items():
        for i in range(0, len(rows), 2):
            _write_csv(f"{raw_dir}/{m}/{m}-{i:03d}.csv", rows[i : i + 2])
    # rescrape: first 5 balls of match 1 again (dup content, new file)
    _write_csv(f"{raw_dir}/01_AAvsBB/01_AAvsBB-re.csv", by_match["01_AAvsBB"][:5])

    q = run_incremental_pipeline(
        spark,
        raw_dir=f"{raw_dir}/*/",
        silver_path=f"{base}/silver",
        gold_dir=f"{base}/gold",
        meta_df=match_meta(spark),
        players_df=players(spark),
        checkpoint_dir=f"{base}/ckpt",
        bronze_path=f"{base}/bronze",
        available_now=True,
        gold_mode="incremental",
    )
    q.awaitTermination(300)

    batch_silver = to_silver(
        to_bronze(raw_deliveries(spark)), match_meta(spark), players(spark)
    )
    for name, builder in BATCH_BUILDERS.items():
        got = _canon(spark.read.parquet(f"{base}/gold/{name}"))
        want = _canon(builder(batch_silver))
        assert got == want, name
