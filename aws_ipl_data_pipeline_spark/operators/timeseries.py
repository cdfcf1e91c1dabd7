"""Regular-grid time-series maintenance: gap filling / resampling.

Sensor feeds, metric streams, and event-rate series all need the same
preparation before modeling: bucket to a regular grid, then fill the
buckets nothing landed in. The fill policy here is linear
interpolation between the nearest observed buckets on each side — the
standard resampling primitive (`pandas.Series.interpolate`, TimescaleDB
`time_bucket_gapfill` + `interpolate`), expressed as pure DataFrame
ops so it runs JVM-side at any scale.

Scale posture: everything is keyed by the series id. The spine is
generated per key with `sequence()` (bounded by the key's own time
span — never a global calendar cross join), the observation join is a
key+bucket equi-join, and the four neighbor lookups are two RUNNING
window nodes (forward + reversed order) over one
`hashpartitioning(key)` exchange (bounded partitions: one series
each). Nothing global, nothing Python-side.

Determinism: bucket ids are exact integer `div`s of epoch
microseconds; observed bucket values are quantized to integer
10^-ndigits units BEFORE interpolation, and the interpolation itself
is pure int64 arithmetic with truncating division (Spark `div` and
DuckDB `//` both truncate toward zero, so the quantized result is
bit-identical across engines). A first float-rounded cut failed the
oracle precisely as the repo's rounding gotcha predicts: the midpoint
of two 4dp values lands EXACTLY on a .00005 boundary, where Spark's
decimal-string HALF_UP and DuckDB's binary rounding disagree —
integer interpolation sidesteps the boundary entirely. The one
remaining double rounding (mean → quantum) is the same
negligible-boundary class as every rounded aggregate in the battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICROS_PER_HOUR = 3_600_000_000


def cusum_stat(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    delta_col: str,
    out_col: str = "cusum",
) -> DataFrame:
    """Upper CUSUM statistic S_t = max(0, S_{t-1} + d_t) per key,
    WITHOUT a sequential fold: the recurrence has the closed form
    S_t = P_t − min(0, min_{j≤t} P_j) with P the running prefix sum,
    so it becomes two RUNNING window aggregates over one key
    clustering — O(n) per key, distributed, and exact when the deltas
    are integers (int64 prefix sums are order-independent; the
    classic float fold is not). The trailing order column must be
    unique within a key for determinism."""
    run = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = df.withColumn("_cusum_psum", F.sum(delta_col).over(run))
    return p.withColumn(
        out_col,
        F.col("_cusum_psum")
        - F.least(
            F.lit(0).cast("long"), F.min("_cusum_psum").over(run)
        ),
    ).drop("_cusum_psum")


def gap_fill_linear(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_micros: int = MICROS_PER_HOUR,
    ndigits: int = 4,
) -> DataFrame:
    """Bucket each key's events to a regular grid and linearly
    interpolate empty buckets.

    Returns (key, bucket, value, filled): one row per grid bucket from
    the key's first observed bucket through its last; ``value`` is the
    quantized per-bucket mean where observed, else the integer linear
    interpolation between the nearest observed neighbors, surfaced as
    a double in original units (exact: int64 / 10^ndigits is one
    correctly-rounded IEEE op on both engines); ``filled`` marks
    interpolated rows. Spine endpoints are observed by construction,
    so every gap is interior — prev/next always exist.

    The gap rows' denominator (next_bucket - prev_bucket) is guarded
    with a when() because Spark evaluates both CASE branches under
    ANSI: on observed rows prev == next == the row itself and the raw
    expression would divide by zero even though the branch is unused.
    """
    scale = 10 ** int(ndigits)
    ev = events.select(
        F.col(key_col).alias("k"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {int(bucket_micros)}").alias(
            "bucket"
        ),
        F.col(value_col).alias("_v"),
    )
    obs = ev.groupBy("k", "bucket").agg(
        F.round(F.avg("_v") * scale, 0).cast("long").alias("_obs")
    )
    rng = obs.groupBy("k").agg(
        F.min("bucket").alias("_h0"), F.max("bucket").alias("_h1")
    )
    spine = rng.select(
        "k", F.explode(F.sequence("_h0", "_h1")).alias("bucket")
    )
    j = spine.join(obs, ["k", "bucket"], "left")
    # Both directions use running UNBOUNDED-PRECEDING frames: Spark
    # evaluates those as O(n) per key (one accumulating pass), while an
    # (currentRow, unboundedFollowing) frame re-aggregates the
    # remaining rows for EVERY row — O(n²) per key, measured 14.8 s vs
    # 1.5 s on sf0.1's 1.05M-row spine. "Next observed" is therefore a
    # running last() over the REVERSED bucket order; the second Window
    # node reuses the first's key clustering and only adds the
    # in-partition re-sort.
    wp = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("k")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bucket = F.when(F.col("_obs").isNotNull(), F.col("bucket"))
    staged = j.select(
        "k",
        "bucket",
        "_obs",
        F.last("_obs", ignorenulls=True).over(wp).alias("_pv"),
        F.last(obs_bucket, ignorenulls=True).over(wp).alias("_ph"),
        F.last("_obs", ignorenulls=True).over(wn).alias("_nv"),
        F.last(obs_bucket, ignorenulls=True).over(wn).alias("_nh"),
    ).withColumn(
        "_den",
        F.when(F.col("_nh") != F.col("_ph"), F.col("_nh") - F.col("_ph"))
        .otherwise(F.lit(1))
        .cast("long"),
    )
    interp = F.expr("_pv + ((_nv - _pv) * (bucket - _ph)) div _den")
    return staged.select(
        F.col("k").alias(key_col),
        "bucket",
        (
            F.when(F.col("_obs").isNotNull(), F.col("_obs"))
            .otherwise(interp)
            .cast("double")
            / F.lit(float(scale))
        ).alias("value"),
        F.col("_obs").isNull().alias("filled"),
    )
