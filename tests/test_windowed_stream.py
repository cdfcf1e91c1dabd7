"""ST6: the watermark-windowed aggregation produces identical windows
whether driven as a stream (file micro-batches) or as one batch."""

from __future__ import annotations

import json
import os

import pytest

from aws_ipl_data_pipeline_spark.streaming import windowed_event_counts

SCHEMA = "event_id long, ts timestamp, event_type string, value double"

ROWS = [
    # two hourly windows; second file delivers late-but-in-watermark rows
    [
        (1, "2024-03-01 10:05:00", "click", 1.0),
        (2, "2024-03-01 10:55:00", "click", 2.0),
        (3, "2024-03-01 11:10:00", "view", 4.0),
    ],
    [
        (4, "2024-03-01 11:40:00", "click", 8.0),
        (5, "2024-03-01 10:20:00", "view", 16.0),  # late for 10:00 window
    ],
]


def _write(dirname: str, i: int, rows) -> None:
    os.makedirs(dirname, exist_ok=True)
    with open(f"{dirname}/f{i}.json", "w") as f:
        for e, ts, ty, v in rows:
            f.write(
                json.dumps({"event_id": e, "ts": ts, "event_type": ty, "value": v})
                + "\n"
            )


@pytest.mark.slow
def test_windowed_counts_stream_equals_batch(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("winstream"))
    src = f"{base}/src"
    for i, rows in enumerate(ROWS):
        _write(src, i, rows)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    from datetime import datetime

    batch_df = spark.createDataFrame(
        [
            (e, datetime.fromisoformat(ts), ty, v)
            for rows in ROWS
            for e, ts, ty, v in rows
        ],
        SCHEMA,
    )
    batch = windowed_event_counts(batch_df, window="1 hour", watermark="2 hours")
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    streamed = spark.table("win_counts")
    assert canon(streamed) == canon(batch)
    # the late row landed in its event-time window, not arrival order
    ten_view = [r for r in streamed.collect() if r["event_type"] == "view" and r["start"].hour == 10]
    assert len(ten_view) == 1 and ten_view[0]["n"] == 1 and ten_view[0]["total_value"] == 16.0


@pytest.mark.slow
def test_dedup_within_watermark_stream(spark, tmp_path_factory):
    """Duplicate event_ids delivered across micro-batches within the
    watermark horizon must surface exactly once, matching the batch
    dropDuplicates result."""
    from aws_ipl_data_pipeline_spark.streaming import dedup_within_watermark

    base = str(tmp_path_factory.mktemp("dedupstream"))
    src = f"{base}/src"
    rows = [
        [
            (1, "2024-03-01 10:05:00", "click", 1.0),
            (2, "2024-03-01 10:10:00", "view", 2.0),
        ],
        [
            (1, "2024-03-01 10:05:00", "click", 1.0),  # dup of batch 0
            (2, "2024-03-01 10:12:00", "view", 3.0),   # same key, later ts: also dup
            (3, "2024-03-01 10:30:00", "click", 4.0),
        ],
    ]
    for i, batch in enumerate(rows):
        _write(src, i, batch)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = (
        dedup_within_watermark(stream, keys=["event_id"], watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    ids = sorted(r["event_id"] for r in got)
    assert ids == [1, 2, 3]  # each key exactly once despite redelivery


@pytest.mark.slow
def test_append_mode_no_resurrection_after_eviction(spark, tmp_path_factory):
    """Watermark guarantees, stated precisely: eviction is the point of
    no return. While a window's state is still live a late row MAY be
    absorbed (watermark is a one-sided bound), but once the watermark
    passed the window's end and it emitted+evicted, a later row for it
    is FILTERED — never resurrected as a duplicate append — and a
    still-open window emits nothing at stream end. File timeline (one
    file per micro-batch): f0 raises the watermark to 12:10; f1 lets
    the 10:00/11:00 windows emit and evict; f2 then delivers a
    too-late 10:20 row (filtered) and a 13:20 row (held open)."""
    base = str(tmp_path_factory.mktemp("latedrop"))
    src = f"{base}/src"
    _write(src, 0, [
        (1, "2024-03-01 10:10:00", "click", 1.0),
        (2, "2024-03-01 11:40:00", "click", 2.0),
        (3, "2024-03-01 13:10:00", "click", 4.0),
    ])
    _write(src, 1, [
        (4, "2024-03-01 13:15:00", "click", 32.0),  # filler: triggers eviction
    ])
    _write(src, 2, [
        (5, "2024-03-01 10:20:00", "click", 8.0),   # after eviction: filtered
        (6, "2024-03-01 13:20:00", "click", 16.0),  # open window: held
    ])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("append_windows")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = [
        (r["start"].hour, r["n"], r["total_value"])
        for r in spark.table("append_windows").collect()
    ]
    assert sorted(got) == [(10, 1, 1.0), (11, 1, 2.0)], got
    # exactly one emission per closed window (no resurrection), the
    # late row 5 is absent, and the open 13:00 window never emitted


@pytest.mark.slow
def test_session_windows_stream_equals_batch_with_merge(spark, tmp_path_factory):
    """Streaming session windows (dynamic gap) must equal the batch
    form, INCLUDING the session-merge path: a bridging event arriving
    in a later micro-batch extends an earlier open session, and two
    provisional sessions an in-between event connects collapse into
    one. A far-future flush row advances the watermark so every real
    session closes; its own still-open session must NOT be emitted."""
    from datetime import datetime

    from aws_ipl_data_pipeline_spark.streaming import (
        sessionized_event_rollup,
    )

    u_schema = "event_id long, ts timestamp, user_id long, value double"
    batches = [
        [
            (1, "2024-03-01 10:00:00", 1, 1.0),
            (2, "2024-03-01 10:10:00", 1, 2.0),
            (3, "2024-03-01 11:30:00", 1, 4.0),
            (4, "2024-03-01 10:05:00", 2, 8.0),
        ],
        [
            (5, "2024-03-01 10:25:00", 1, 16.0),  # extends session A
            (6, "2024-03-01 11:05:00", 1, 32.0),  # merges into session B
            (7, "2024-03-01 20:00:00", 3, 64.0),  # watermark flush; stays open
        ],
    ]
    base = str(tmp_path_factory.mktemp("sesswin"))
    src = f"{base}/src"
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        path = f"{src}/f{i}.json"
        with open(path, "w") as f:
            for e, ts, u, v in rows:
                f.write(
                    json.dumps(
                        {"event_id": e, "ts": ts, "user_id": u, "value": v}
                    )
                    + "\n"
                )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(u_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        sessionized_event_rollup(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sess_roll")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch_df = spark.createDataFrame(
        [
            (e, datetime.fromisoformat(ts), u, v)
            for rows in batches
            for e, ts, u, v in rows
        ],
        u_schema,
    )
    batch = sessionized_event_rollup(
        batch_df, gap="30 minutes", watermark="1 hour"
    )
    canon = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.where("user_id <> 3").collect()
    )
    streamed = spark.table("sess_roll")
    assert canon(streamed) == canon(batch)
    got = {
        (r["user_id"], r["start"].hour, r["start"].minute): (
            r["n_events"],
            r["total_value"],
        )
        for r in streamed.collect()
    }
    # session A: 10:00 + 10:10 + the batch-2 bridge 10:25 (merge into
    # the open session); session B: 11:05 merged with 11:30
    assert got[(1, 10, 0)] == (3, 19.0)
    assert got[(1, 11, 5)] == (2, 36.0)
    assert got[(2, 10, 5)] == (1, 8.0)
    # the flush row's own session is still open -> not emitted
    assert all(k[0] != 3 for k in got)


@pytest.mark.slow
def test_session_rollup_checkpoint_replay_emits_nothing_new(
    spark, tmp_path_factory
):
    """Restarting the session-window stream against the same checkpoint
    with no new files must emit zero additional rows — closed sessions
    are not re-emitted (exactly-once via the commit log), and the
    still-open flush session stays held."""
    from datetime import datetime  # noqa: F401

    from aws_ipl_data_pipeline_spark.streaming import (
        sessionized_event_rollup,
    )

    u_schema = "event_id long, ts timestamp, user_id long, value double"
    rows = [
        (1, "2024-03-01 10:00:00", 1, 1.0),
        (2, "2024-03-01 10:10:00", 1, 2.0),
        (3, "2024-03-01 20:00:00", 9, 4.0),  # flush
    ]
    base = str(tmp_path_factory.mktemp("sessreplay"))
    src = f"{base}/src"
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/f0.json", "w") as f:
        for e, ts, u, v in rows:
            f.write(
                json.dumps({"event_id": e, "ts": ts, "user_id": u, "value": v})
                + "\n"
            )

    out = f"{base}/out"

    def run():
        stream = spark.readStream.schema(u_schema).json(src)
        q = (
            sessionized_event_rollup(stream, gap="30 minutes", watermark="1 hour")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out).count()

    first = run()
    assert first == 1  # user 1's closed session only
    second = run()  # SAME checkpoint + sink, no new files
    assert second == 1  # nothing re-emitted, nothing duplicated
