"""Data-quality expectations: declarative rule checks in ONE pass.

The ingest-contract pattern (Deequ/Great-Expectations shape): every
rule — null checks, range checks, set membership, key uniqueness —
compiles to a conditional aggregate over the SAME single scan, so a
20-rule contract costs one job, not 20. At 100 TB that difference is
the difference between "validation runs on every load" and
"validation is sampled on Tuesdays".

Violation counts (not booleans) come back per rule so callers can
threshold ("fail the load if >0.1% bad") instead of hard-failing on
one bad row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_keys: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows).

    ``rules`` maps rule name → a Column that is TRUE when the row
    VIOLATES the rule. ``unique_keys`` adds uniqueness rules (name,
    key columns): violations = rows beyond the first per key
    (count - distinct-count). Everything folds into a single
    aggregation: one scan, one reduce, map-side combinable.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    names: list[str] = []
    for i, (name, viol) in enumerate(rules):
        aggs.append(
            F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias(f"_v{i}")
        )
        names.append(name)
    for j, (name, keys) in enumerate(unique_keys or []):
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(*[F.col(k) for k in keys]))
            .cast("long")
            .alias(f"_u{j}")
        )
        names.append(name)

    row = df.agg(*aggs)
    cols = [f"_v{i}" for i in range(len(rules))] + [
        f"_u{j}" for j in range(len(unique_keys or []))
    ]
    stacked = F.array(
        *[
            F.struct(F.lit(n).alias("rule"), F.col(c).alias("n_violations"))
            for n, c in zip(names, cols)
        ]
    )
    return row.select(F.explode(stacked).alias("_p"), F.col("_n").alias("n_rows")).select(
        F.col("_p.rule").alias("rule"),
        F.col("_p.n_violations").alias("n_violations"),
        "n_rows",
    )
