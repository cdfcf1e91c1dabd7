"""Versioned snapshot tables — native parquet time travel.

The reference's gold tables are full-overwrite Delta tables
(pipeline_2026/ex_match_sg.py:331-347), which gives readers snapshot
isolation and version history for free. With delta-spark unavailable,
this module provides the same two properties on plain parquet:

Layout::

    <path>/v=00000001/          immutable snapshot data (parquet)
    <path>/v=00000002/
    <path>/_latest_v00000002    zero-byte pointer marker

A writer materializes the NEXT version directory completely, then flips
the pointer by creating the new marker before deleting the old one —
a reader that lists markers and takes the max always resolves to a
fully-written snapshot, never a mix (if a crash leaves two markers, the
max is the newer complete snapshot; if a crash leaves a version dir
with no marker, it is simply unreferenced and vacuumable). Old versions
stay readable — and queryable by explicit version — until vacuumed.

Scale notes: snapshots are immutable directories, so the pattern works
unchanged on object stores (no rename-on-directory needed — the only
mutation is creating/deleting zero-byte markers); history cost is
bounded by ``vacuum_snapshots(keep_last=...)``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from aws_ipl_data_pipeline_spark.sources.maintenance import _fs_and_path

_MARKER_RE = re.compile(r"_latest_v(\d{8})$")
_VDIR_RE = re.compile(r"v=(\d{8})$")


def _list_names(spark: SparkSession, path: str) -> list[str]:
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """All materialized snapshot versions, ascending."""
    out = []
    for name in _list_names(spark, path):
        m = _VDIR_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(spark: SparkSession, path: str) -> int | None:
    """The committed version: max pointer marker; falls back to the max
    version directory when no marker survived (unreferenced dirs from a
    crashed pre-flip writer lose to any marked version, so the fallback
    only triggers when no flip ever completed)."""
    marked = [
        int(m.group(1))
        for name in _list_names(spark, path)
        if (m := _MARKER_RE.match(name))
    ]
    if marked:
        return max(marked)
    versions = list_versions(spark, path)
    return versions[-1] if versions else None


def write_snapshot(df: DataFrame, path: str) -> int:
    """Materialize ``df`` as the next snapshot version and flip the
    pointer. Returns the new version number.

    The next version is allocated above EVERY existing version
    directory, not just the committed marker: a crashed pre-flip writer
    leaves an unmarked v=N+1 dir, and allocating committed+1 would
    collide with it forever (errorifexists), wedging the table for all
    future writers. Readers never see such dirs (markers win), and
    ``vacuum_snapshots`` reclaims them."""
    spark = df.sparkSession
    cur = current_version(spark, path)
    nxt = max(cur or 0, *list_versions(spark, path), 0) + 1
    df.write.mode("errorifexists").parquet(f"{path.rstrip('/')}/v={nxt:08d}")
    fs, _ = _fs_and_path(spark, path)
    _, jmarker = _fs_and_path(spark, f"{path.rstrip('/')}/_latest_v{nxt:08d}")
    fs.create(jmarker, True).close()  # flip: new marker first...
    for name in _list_names(spark, path):  # ...then retire old markers
        m = _MARKER_RE.match(name)
        if m and int(m.group(1)) != nxt:
            _, jold = _fs_and_path(spark, f"{path.rstrip('/')}/{name}")
            fs.delete(jold, False)
    return nxt


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the committed snapshot (or an explicit past ``version`` —
    time travel, while it remains un-vacuumed)."""
    v = version if version is not None else current_version(spark, path)
    if v is None:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    return spark.read.parquet(f"{path.rstrip('/')}/v={v:08d}")


def vacuum_snapshots(
    spark: SparkSession, path: str, keep_last: int = 2
) -> list[int]:
    """Delete all but the newest ``keep_last`` snapshots (the committed
    version is always kept). Unmarked version dirs ABOVE the committed
    version — debris from crashed pre-flip writers — can never become
    the committed snapshot (new writers allocate past them), so they are
    always reclaimed rather than occupying keep slots. Returns the
    versions removed."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(spark, path)
    committed = current_version(spark, path)
    if committed is not None:
        orphans = [v for v in versions if v > committed]
        live = [v for v in versions if v <= committed]
    else:
        orphans, live = [], versions
    keep = set(live[-keep_last:])
    if committed is not None:
        keep.add(committed)
    doomed = orphans + [v for v in live if v not in keep]
    fs, _ = _fs_and_path(spark, path)
    for v in doomed:
        _, jdir = _fs_and_path(spark, f"{path.rstrip('/')}/v={v:08d}")
        fs.delete(jdir, True)
    return doomed
