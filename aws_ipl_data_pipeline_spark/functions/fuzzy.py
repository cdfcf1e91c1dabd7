"""Team-scoped fuzzy name normalization — the one genuinely custom operator.

Reference semantics (pipeline_2026/ex_match_bs.py:198-210,249-259,314-336):
raw scraped player names are matched against the master player catalog with
a similarity scorer, cutoff 75; the candidate set is *blocked* to the
playing team's squad (team name itself fuzzy-resolved, cutoff 70), falling
back to all players. The reference computes the match once per distinct
name and broadcasts it back via a dict map (ex_match_bs.py:324-326).

Spark-first realization (scales to 100 TB of deliveries):

1. The player catalog is a tiny dimension — collected once on the driver
   and broadcast to executors (``sc.broadcast``), like any dim-table
   broadcast join. The fact table is never collected.
2. Similarity scoring runs only over DISTINCT (scope, name) pairs — a
   shuffle-free ``dropDuplicates`` then an Arrow-batched pandas UDF.
   Distinct player names are O(thousands) regardless of fact rows.
3. The canonical mapping is broadcast-hash-joined back onto the fact
   table — no shuffle of the big side when the mapping is small (it is).

The scorer uses rapidfuzz when importable, else a pure-Python
token-aware Indel-similarity fallback (same 0-100 scale, same cutoffs).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional accelerator; not required
    from rapidfuzz import fuzz as _rf_fuzz
    from rapidfuzz import process as _rf_process

    HAVE_RAPIDFUZZ = True
except Exception:  # pragma: no cover
    HAVE_RAPIDFUZZ = False

PLAYER_CUTOFF = 75.0  # reference ex_match_bs.py:198
TEAM_CUTOFF = 70.0  # reference ex_match_bs.py:256

# The scorer is PINNED, not silently auto-switched: the reference's
# cutoffs (75/70) are calibrated to rapidfuzz WRatio, and a quiet
# fallback would let silver name normalization differ between
# environments. SPARK_GRAFT_FUZZY_SCORER ∈ {auto, rapidfuzz, indel};
# requesting rapidfuzz where it isn't importable is a hard error.
_SCORER_ENV = "SPARK_GRAFT_FUZZY_SCORER"


def resolve_scorer() -> str:
    """Return the pinned scorer name ('rapidfuzz' or 'indel')."""
    choice = os.environ.get(_SCORER_ENV, "auto").lower()
    if choice not in {"auto", "rapidfuzz", "indel"}:
        raise ValueError(
            f"{_SCORER_ENV} must be auto|rapidfuzz|indel, got {choice!r}"
        )
    if choice == "rapidfuzz" and not HAVE_RAPIDFUZZ:
        raise ImportError(
            f"{_SCORER_ENV}=rapidfuzz but rapidfuzz is not importable; "
            "install it or pin indel explicitly"
        )
    if choice == "auto":
        return "rapidfuzz" if HAVE_RAPIDFUZZ else "indel"
    return choice


def _indel_ratio(a: str, b: str, min_sim: float = 0.0) -> float:
    """Indel similarity on a 0-100 scale (rapidfuzz fuzz.ratio analogue):
    100 * (1 - indel_distance / (len(a)+len(b))), via LCS length.

    ``min_sim`` is a correctness-preserving cutoff (r13, VERDICT r12
    #4 — the Ukkonen band the downstream argmax already implies): the
    true similarity is returned EXACTLY whenever it is >= min_sim; a
    pair provably below the cutoff may return an underestimate (>= 0).
    Soundness: sim >= min_sim ⇔ indel distance d <= k with
    k = floor((la+lb)·(1−min_sim/100)); any alignment path through a
    cell with |i−j| > k costs > k, so restricting the DP to the
    |i−j| <= k band computes the exact LCS for every in-cutoff pair,
    and out-of-band cells treated as 0 only ever UNDERestimate the
    LCS (they hold a lower bound), keeping rejected pairs rejected."""
    if not a and not b:
        return 100.0
    if not a or not b:
        return 0.0
    la, lb = len(a), len(b)
    if min_sim > 0.0:
        # cheap upper bound: lcs <= min(la, lb)
        if 200.0 * min(la, lb) / (la + lb) < min_sim:
            return 0.0
        # +1e-9: float truncation must never UNDERSIZE the band (e.g.
        # 5·(1−0.8) evaluates to 0.999…8 and int() would give k=0 for a
        # true boundary distance of 1); an oversized band is just exact
        k = int((la + lb) * (100.0 - min_sim) / 100.0 + 1e-9)
        if abs(la - lb) > k:
            return 0.0
    else:
        k = la if la > lb else lb  # full band
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(max(1, i - k), min(lb, i + k) + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    # (la, lb) is always inside the band here: |la-lb| > k returned early
    return 200.0 * prev[lb] / (la + lb)


def score(a: str, b: str, min_sim: float = 0.0) -> float:
    """WRatio-like composite: best of full / token-sorted / substring.

    ``min_sim`` propagates the caller's running cutoff into the DP
    band (values >= min_sim are exact; see _indel_ratio)."""
    a, b = a.lower().strip(), b.lower().strip()
    if a == b:
        return 100.0
    if resolve_scorer() == "rapidfuzz":
        return float(_rf_fuzz.WRatio(a, b))
    s = _indel_ratio(a, b, min_sim)
    ts = _indel_ratio(
        " ".join(sorted(a.split())), " ".join(sorted(b.split())), min_sim
    )
    sub = 90.0 if (len(a) >= 3 and (a in b or b in a)) else 0.0
    return max(s, ts, sub)


def extract_one(query: str, choices: list[str], cutoff: float = 0.0) -> str | None:
    """Best-scoring choice above cutoff, else None.

    The running best feeds back into score() as the DP cutoff: scores
    that would not change the argmax are allowed to underestimate, so
    the banded scorer prunes exactly the work the comparison below
    discards — the selected choice and its score are unchanged."""
    if not query or not choices:
        return None
    if resolve_scorer() == "rapidfuzz":
        m = _rf_process.extractOne(query, choices, score_cutoff=cutoff)
        return m[0] if m else None
    best, best_s = None, cutoff
    for c in choices:
        s = score(query, c, min_sim=best_s)
        if s > best_s or (s == best_s and best is None and s >= cutoff):
            best, best_s = c, s
    return best


def match_name(raw: str | None, choices: list[str], cutoff: float = PLAYER_CUTOFF) -> str:
    """Reference match_player_name (ex_match_bs.py:198-210): canonical
    name above cutoff, else the cleaned raw name; N/A passthrough."""
    if raw is None or raw == "N/A" or (isinstance(raw, float) and pd.isna(raw)):
        return "N/A"
    raw_clean = str(raw).strip()
    if not choices:
        return raw_clean
    m = extract_one(raw_clean, choices, cutoff)
    return m if m is not None else raw_clean


def team_choices(
    team: str | None, team_player_map: dict[str, list[str]], all_players: list[str]
) -> list[str]:
    """Reference get_team_player_choices (ex_match_bs.py:249-259): the
    team's squad, fuzzy team-name resolution at cutoff 70, else everyone."""
    if not team or team == "N/A" or not team_player_map:
        return all_players
    if team in team_player_map:
        return team_player_map[team]
    m = extract_one(team, list(team_player_map), TEAM_CUTOFF)
    return team_player_map[m] if m is not None else all_players


def _build_normalizer(spark, players_df: DataFrame, cutoff: float):
    """Collect the tiny player catalog, broadcast it, and return the
    Arrow-batched (name, scope) → canonical-name pandas UDF."""
    catalog = (
        players_df.select(
            F.col("Name").alias("_p_name"), F.col("Team").alias("_p_team")
        )
        .where(F.col("Name").isNotNull())
        .collect()
    )  # tiny dimension: O(#players); never the fact table
    team_map: dict[str, list[str]] = {}
    all_players: list[str] = []
    for r in catalog:
        all_players.append(r._p_name)
        if r._p_team:
            team_map.setdefault(r._p_team, []).append(r._p_name)
    all_players = sorted(set(all_players))
    bc = spark.sparkContext.broadcast((team_map, all_players))

    @F.pandas_udf(T.StringType())
    def _normalize(names: pd.Series, scopes: pd.Series) -> pd.Series:
        tmap, everyone = bc.value
        cache: dict[tuple, str] = {}
        out = []
        for raw, scope in zip(names, scopes):
            key = (raw, scope)
            if key not in cache:
                choices = team_choices(scope, tmap, everyone)
                cache[key] = match_name(raw, choices, cutoff)
            out.append(cache[key])
        return pd.Series(out)

    return _normalize


def normalize_names_multi(
    df: DataFrame,
    players_df: DataFrame,
    specs: list[tuple[str, str]],
    cutoff: float = PLAYER_CUTOFF,
) -> DataFrame:
    """Normalize several name columns in ONE distinct-pairs pass.

    ``specs`` is a list of (name_col, scope_col), each rewritten in
    place. A naive per-column call re-derives the distinct pairs from
    ``df`` once per column — and with it the whole upstream lineage
    (the bronze fold ran 4× in the silver plan before this). Here the
    (name, scope) pairs of every spec are unpivoted into one frame,
    deduped once, scored once, and broadcast-joined back per column:
    the upstream lineage is evaluated for the pairs branch exactly once
    however many columns are normalized.
    """
    spark = df.sparkSession
    _normalize = _build_normalizer(spark, players_df, cutoff)

    pair_structs = F.array(
        *[
            F.struct(
                F.col(nc).cast("string").alias("_raw"),
                F.col(sc).cast("string").alias("_scope"),
            )
            for nc, sc in specs
        ]
    )
    pairs = (
        df.select(F.explode(pair_structs).alias("_p"))
        .select("_p._raw", "_p._scope")
        .dropDuplicates()
        .withColumn("_canonical", _normalize(F.col("_raw"), F.col("_scope")))
    )
    if len(specs) > 1:
        # Materialize the scored pairs ONCE (the frame is O(distinct
        # names) — tiny) so the per-column broadcast joins below read the
        # checkpointed rows instead of re-running the scoring UDF and the
        # whole upstream lineage once per column.
        pairs = pairs.localCheckpoint(eager=True)

    for nc, sc in specs:
        renamed = pairs.select(
            F.col("_raw").alias("_j_raw"),
            F.col("_scope").alias("_j_scope"),
            F.col("_canonical").alias("_j_canon"),
        )
        df = (
            df.join(
                F.broadcast(renamed),
                df[nc].eqNullSafe(renamed["_j_raw"])
                & df[sc].eqNullSafe(renamed["_j_scope"]),
                "left",
            )
            .withColumn(nc, F.coalesce("_j_canon", F.lit("N/A")))
            .drop("_j_raw", "_j_scope", "_j_canon")
        )
    return df


def normalize_names(
    df: DataFrame,
    players_df: DataFrame,
    name_col: str,
    scope_col: str,
    out_col: str | None = None,
    cutoff: float = PLAYER_CUTOFF,
) -> DataFrame:
    """Normalize ``name_col`` against the player catalog, blocked by the
    team in ``scope_col``. Distinct-pairs → pandas UDF → broadcast join
    back (reference's b_map optimization, ex_match_bs.py:324-336, made
    distributed). For several columns use normalize_names_multi (one
    pairs pass for all of them)."""
    out_col = out_col or name_col
    if out_col == name_col:
        return normalize_names_multi(df, players_df, [(name_col, scope_col)], cutoff)

    _normalize = _build_normalizer(df.sparkSession, players_df, cutoff)
    pairs = (
        df.select(F.col(name_col).alias("_raw"), F.col(scope_col).alias("_scope"))
        .dropDuplicates()
        .withColumn("_canonical", _normalize(F.col("_raw"), F.col("_scope")))
    )
    joined = df.join(
        F.broadcast(pairs),
        (df[name_col].eqNullSafe(pairs["_raw"]))
        & (df[scope_col].eqNullSafe(pairs["_scope"])),
        "left",
    )
    return joined.withColumn(out_col, F.coalesce("_canonical", F.lit("N/A"))).drop(
        "_raw", "_scope", "_canonical"
    )
