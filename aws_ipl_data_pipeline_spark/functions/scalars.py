"""Scalar column-expression builders shared across plans.

All are pure Column expressions (SURVEY §2.7 F1-F15) — no UDFs, so they
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def innings_phase(over: Column | str = "over") -> Column:
    """Powerplay(<6) / Middle Overs(<15) / Death Overs(<20) / Super Over.

    Reference get_innings_phase, pipeline_2026/ex_match_bs.py:261-274;
    non-numeric input → 'Unknown'.
    """
    o = (F.col(over) if isinstance(over, str) else over).cast("int")
    return (
        F.when(o.isNull(), "Unknown")
        .when(o < 6, "Powerplay")
        .when(o < 15, "Middle Overs")
        .when(o < 20, "Death Overs")
        .otherwise("Super Over")
    )


def safe_div(num: Column, den: Column, zero_becomes: float = 1.0) -> Column:
    """num / den with den==0 replaced by ``zero_becomes``.

    Exact-parity port of the reference's ``.replace(0, 1)`` denominator
    guard (pipeline_2026/ex_match_sg.py:144-146,167-170): divide by 1 —
    NOT null — when the denominator is zero.
    """
    return num / F.when(den == 0, F.lit(zero_becomes)).otherwise(den)


def overs_notation(balls: Column) -> Column:
    """legal_balls → cricket overs notation: balls//6 + (balls%6)/10.

    Reference pipeline_2026/ex_match_sg.py:165,193,287-289.
    """
    return F.floor(balls / 6) + (balls % 6) / 10.0


def not_na(col: Column | str) -> Column:
    """NOT NULL and != 'N/A' — the reference's null-sentinel duality
    (pipeline_2026/ex_match_sg.py:124,153,182,217-220)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (c != "N/A")


def bounded_window_key(col: Column | str) -> Column:
    """Constant, non-foldable partition key (`xxhash64(col) % 1` == 0
    for EVERY row of ANY type, nulls included) marking a DELIBERATELY
    single-partition window over a frame already bounded by an
    upstream limit/agg (a TakeOrderedAndProject top-k prefix, a
    post-agg teams/buckets frame). Semantically identical to an
    unpartitioned window, but keeps `WindowExec: No Partition Defined`
    a true full-table-scale warning elsewhere: bounded frames opt out
    explicitly instead of spamming the log. Non-foldable on purpose —
    a literal would be constant-folded out of the partition spec and
    the warning would return. xxhash64 (ADVICE r7) makes the key TOTAL:
    a bare `col % 1` implicitly casts strings to double (non-numeric →
    null) and passes nulls through, silently splitting the window into
    a null partition + a zero partition and duplicating ranks; xxhash64
    returns a non-null bigint for every input type, so the key is
    always exactly 0. Plan gates keep matching on the `% 1)` marker."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c) % F.lit(1)


def flag(cond: Column) -> Column:
    """Boolean condition → 0/1 int, as the reference stores flags
    (pipeline_2026/ex_match_bs.py:300-304)."""
    return cond.cast("int")


def lit_double_array(values) -> Column:
    """Literal array<double> built as ONE parsed SQL expression. The
    element-wise Column form (F.array of k F.lit(...) calls) costs 2k+
    py4j round-trips PER ARRAY — measured r12 as the dominant cost of
    several query builds (kmeans centroid literals: ~5 s of DataFrame
    construction around 0.3 s of execution). String casts round-trip
    exactly (repr is shortest-exact, Double.parseDouble is correctly
    rounded), so the literal values are bit-identical to F.lit."""
    body = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in values)
    return F.expr(f"array({body})")


def lit_long_array(values) -> Column:
    """Literal array<bigint> as ONE parsed SQL expression (see
    lit_double_array for why)."""
    body = ",".join(f"{int(x)}L" for x in values)
    return F.expr(f"array({body})")
