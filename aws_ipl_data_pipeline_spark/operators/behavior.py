"""Behavioral analytics operators: parameterized funnel over event
streams.

The registered queries (`funnel_analysis`, `retention_cohorts`,
`event_rate_anomalies`) fix their shapes for the oracle; this module
is the reusable API — arbitrary stage lists, any entity/type/time
columns — with the same single-partitioning plan: every stage is one
more conditional-min window over the SAME entity partitioning, so an
N-stage funnel still pays exactly one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "us",
) -> DataFrame:
    """Strict-order funnel: per entity, stage k's timestamp is the
    earliest ``stages[k]`` event strictly after stage k-1 completed.

    Returns one row per entity: (entity, t_<stage>..., funnel_stage =
    number of stages completed). All stage columns ride one window
    partitioning on the entity — one Exchange for any number of
    stages."""
    if not stages:
        raise ValueError("stages must be non-empty")
    w = Window.partitionBy(entity_col)
    df = events
    prev: str | None = None
    for stage in stages:
        col = f"t_{stage}"
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    agg = df.groupBy(entity_col).agg(
        *[F.min(f"t_{s}").alias(f"t_{s}") for s in stages]
    )
    # build the when-chain so the DEEPEST reached stage wins: each later
    # stage wraps the previous chain, ending outermost on stages[-1]
    reached = F.lit(0)
    for i, s in enumerate(stages):
        reached = F.when(F.col(f"t_{s}").isNotNull(), i + 1).otherwise(reached)
    return agg.withColumn("funnel_stage", reached.cast("int"))
