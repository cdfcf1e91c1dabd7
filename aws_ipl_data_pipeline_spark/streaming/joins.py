"""Streaming joins: stream-static dimension enrichment and
watermarked stream-stream event-time joins.

The reference enriches per-delivery rows with match metadata read from
a side JSON lookup (reference pipeline_2026/ex_match_bs.py:118-150, an
eager pandas merge after every scrape). In an unbounded setting that
becomes (a) a stream-static broadcast join — the dimension is
re-resolved per micro-batch, so a refreshed dim parquet is picked up
without restarting the query — and (b) a stream-stream join when BOTH
sides arrive continuously (the click→purchase attribution shape).

Scale notes (100 TB/day):
* stream-static: the dim side is broadcast per micro-batch; the stream
  side never shuffles — per-batch cost is O(batch) + one broadcast.
* stream-stream: both sides carry watermarks and the join predicate
  bounds event-time distance, so the state store holds only the
  horizon's rows per key; without the time bound Spark would have to
  keep every row forever (it rejects such joins in append mode).
Both builders are plain DataFrame transforms: applied to a batch frame
they produce the identical plan minus state — which is what the
stream ≡ batch tests (tests/test_stream_joins.py) prove.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: per-row dimension enrichment of an event
    stream. `dim` must be a batch (static) frame; Spark broadcasts it
    into every micro-batch, re-reading the underlying files each
    trigger — so a nightly-refreshed dimension table is picked up live.
    Left join keeps events whose dimension row is missing (late dim
    arrival must not drop facts)."""
    return events.join(F.broadcast(dim), on=on, how=how)


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    view_watermark: str = "2 hours",
    purchase_watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each purchase to
    the views by the same user within `horizon` BEFORE the purchase.

    Input frames must expose (user_id, view_id, view_ts) and
    (user_id, purchase_id, purchase_ts, amount). The event-time range
    predicate `purchase_ts ∈ [view_ts, view_ts + horizon]` plus the two
    watermarks let Spark expire join state: a view older than
    horizon + purchase watermark can never match again and is evicted.
    Output is append-mode-safe (finalized matches only)."""
    v = views.withWatermark("view_ts", view_watermark)
    p = purchases.withWatermark("purchase_ts", purchase_watermark)
    cond = (
        (v["user_id"] == p["user_id"])
        & (p["purchase_ts"] >= v["view_ts"])
        & (p["purchase_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(p, cond, "inner").select(
        v["user_id"],
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "amount",
    )
