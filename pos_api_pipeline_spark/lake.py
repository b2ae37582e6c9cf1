"""Lake layer: partitioned parquet writes + merge/dedup upsert
(SURVEY.md §2.1 S7–S10, §2.6 W4).

The reference hand-rolls a year=/month= S3 layout with a manual
month loop and uuid-suffixed incremental files (reference:
etl/load.py:52-105, 162-224). Spark-first replacement:

- ``partitionBy('year','month')`` produces the identical Hive layout
  in one distributed write — the month loop disappears.
- merge+dedup upsert = unionByName → W1 window dedup → dynamic
  partition overwrite, which rewrites ONLY the partitions present in
  the incoming batch. This implements the reference's *stated intent*;
  the reference itself has a bug where the deduped frame is computed
  but the un-deduped new rows are written (etl/load.py:210-223) —
  documented deviation (SURVEY.md §7.4.8).

Scale notes: dynamic overwrite touches O(affected months), not the
table; the dedup window shuffles only the union'd batch + affected
partitions, never full history. Writers ``repartition`` by the
partition columns so each month lands as a few well-sized files
instead of one file per task (the classic small-files failure).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pos_api_pipeline_spark.operators.windows import window_dedup
from pos_api_pipeline_spark.schemas import CURATED_SCHEMA, conform


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FS API — works
    identically for file://, hdfs:// and any configured object-store
    connector, unlike os.path/shutil which only see the local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def lake_exists(spark: SparkSession, path: str) -> bool:
    """True iff the lake path exists. Used instead of try/except around
    the read: a bare except would treat a transient read failure
    (corrupt footer, permissions, object-store hiccup) as 'first
    write', and the subsequent overwrite would silently replace
    history with just the new batch. Existence is the only condition
    that legitimately means 'first write'; every other error must
    propagate."""
    fs, hpath = _hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def with_partition_columns(df: DataFrame, ts_col: str = "shifted_time") -> DataFrame:
    """year / zero-padded month derived from shifted_time, matching
    the reference layout (etl/load.py:72: '%02d' month)."""
    return df.withColumn("year", F.year(ts_col).cast("string")).withColumn(
        "month", F.format_string("%02d", F.month(ts_col))
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """S9 — schema-enforced partitioned parquet sink.

    Conforms to CURATED_SCHEMA (coerce + reorder, the reference's
    defensive write path), derives partition columns, repartitions BY
    the partition columns — one shuffle partition per (year, month),
    so months write in parallel and each directory gets a handful of
    well-sized files rather than one file per input task (the classic
    small-files failure). File size within a month is bounded with
    ``maxRecordsPerFile`` when given; AQE coalescing handles tiny
    months. (Note ``repartition(1, 'year', 'month')`` would be wrong:
    the leading int is the TOTAL partition count, funnelling every
    month through a single task.)
    """
    curated = conform(df, CURATED_SCHEMA)
    parted = with_partition_columns(curated)
    parted = parted.repartition("year", "month")
    writer = parted.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("year", "month").parquet(path)


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """S10 — lake scan; partition filters on year/month prune files
    (PruneFileSourcePartitions — verify via .explain PartitionFilters)."""
    return spark.read.parquet(path)


def merge_and_overwrite(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys=("receipt_number", "item_name"),
    order_col: str = "shifted_time",
) -> None:
    """W4 — incremental upsert: union affected partitions with the new
    batch, window-dedup (latest wins), dynamically overwrite only
    those partitions.

    Matches the reference's intent at etl/load.py:162-224 (read month
    → concat → dedup → write), minus its write-path bug, plus
    correctness under concurrent months (all affected months handled
    in one write).
    """
    new_curated = with_partition_columns(conform(new_df, CURATED_SCHEMA))

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # Existence check, NOT try/except around the read: a transient
        # read error must propagate — swallowing it would make the
        # dynamic overwrite replace affected months with just the new
        # batch (silent data loss). Only a genuinely absent lake means
        # 'first write'.
        if lake_exists(spark, path):
            # Drop the read-back partition columns and re-derive them:
            # partition-type inference reads month=07 back as int 7,
            # and a type-coerced union would write to a DIFFERENT
            # directory (month=7) than the original (month=07),
            # silently duplicating instead of overwriting.
            existing = with_partition_columns(
                spark.read.parquet(path).drop("year", "month")
            )
            # Restrict history to the affected partitions only — a
            # broadcast semi-join on (year, month) lets Catalyst prune
            # the scan to those directories.
            months = new_curated.select("year", "month").distinct()
            affected = existing.join(F.broadcast(months), ["year", "month"], "left_semi")
            merged = affected.unionByName(new_curated)
        else:
            merged = new_curated
        deduped = window_dedup(merged, keys=keys, order_col=order_col)
        (
            deduped.repartition("year", "month")
            .write.mode("overwrite")
            .partitionBy("year", "month")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_csv(df: DataFrame, path: str) -> None:
    """S7 — CSV sink (header on, the reference's debug/export path)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_single_parquet(df: DataFrame, path: str) -> None:
    """S8 — single-object parquet (the reference's in-memory-buffer
    upload). coalesce(1) deliberately serializes the write — only for
    small exports, never the main lake path."""
    df.coalesce(1).write.mode("overwrite").parquet(path)


def write_orc(
    df: DataFrame, path: str, partition_cols: Sequence[str] = ()
) -> None:
    """ORC sink — the second columnar lake format Spark supports
    natively (Hive-ecosystem consumers often require ORC where the
    parquet lake serves everything else). Same layout contract as the
    parquet sinks: optional Hive-style partition directories, zstd
    compression, predicate pushdown and column pruning on read."""
    w = df.write.mode("overwrite").option("compression", "zstd")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan twin of ``read_lake`` — partition discovery and
    filter pushdown come from the format's native Spark source."""
    return spark.read.orc(path)


def scd2_merge(
    spark: SparkSession,
    dim_path: str,
    updates: DataFrame,
    key: str,
    ts_col: str,
    tracked_cols: Sequence[str],
) -> None:
    """Slowly-changing-dimension type 2 without Delta: emulate
    MERGE INTO with anti-join + union + window (the v1 pattern —
    swap for Delta ``MERGE`` when the runtime has it).

    Rows carry ``valid_from``/``valid_to``/``is_current``; an update
    whose tracked columns differ closes the current row (valid_to =
    new valid_from) and opens a new current one. Unchanged updates
    are no-ops. One shuffle on the key.
    """
    new_rows = updates.select(
        key, *tracked_cols, F.col(ts_col).alias("valid_from")
    )
    # Same rationale as merge_and_overwrite: only a missing path means
    # 'first load'; a failed read of an existing dimension must raise,
    # or the overwrite below would wipe the whole version history.
    if not lake_exists(spark, dim_path):
        out = new_rows.withColumn(
            "valid_to", F.lit(None).cast("timestamp")
        ).withColumn("is_current", F.lit(True))
        out.write.mode("overwrite").parquet(dim_path)
        return
    dim = spark.read.parquet(dim_path)

    # Skip updates identical to the current version (hash compare).
    cur = dim.filter(F.col("is_current"))
    changed = (
        new_rows.alias("n")
        .join(cur.alias("c"), on=key, how="left")
        .filter(
            F.coalesce(
                ~(
                    F.xxhash64(*[F.col(f"n.{c}") for c in tracked_cols])
                    == F.xxhash64(*[F.col(f"c.{c}") for c in tracked_cols])
                ),
                F.lit(True),  # brand-new key
            )
        )
        .select(
            F.col(f"n.{key}").alias(key),
            *[F.col(f"n.{c}").alias(c) for c in tracked_cols],
            F.col("n.valid_from").alias("valid_from"),
        )
    )
    incoming = changed.withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    ).withColumn("is_current", F.lit(True))

    merged = dim.unionByName(incoming)
    # Re-derive validity chains per key: order versions by valid_from,
    # close each with the next version's start.
    w = Window.partitionBy(key).orderBy("valid_from")
    rebuilt = (
        merged.withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    # Rewriting the path we are reading from: stage to a sibling dir,
    # then swap via Hadoop FS renames (works for file:// and hdfs://,
    # unlike shutil). (A cache()-then-overwrite can silently recompute
    # from deleted files under memory pressure — not safe.) Crash
    # safety: the old dimension is renamed aside BEFORE the staging
    # dir takes its place, so at every instant a complete copy exists
    # on disk (as dim_path, __old, or __staging) and recovery is a
    # rename, never a recompute. True atomicity needs a table format —
    # on S3 rename is copy+delete and Delta/Iceberg MERGE is the real
    # fix, as noted above.
    tmp = dim_path.rstrip("/") + "__staging"
    old = dim_path.rstrip("/") + "__old"
    rebuilt.write.mode("overwrite").parquet(tmp)
    fs, dim_p = _hadoop_fs(spark, dim_path)
    _, tmp_p = _hadoop_fs(spark, tmp)
    _, old_p = _hadoop_fs(spark, old)
    if fs.exists(old_p):  # leftover from a previous crashed swap
        fs.delete(old_p, True)
    if not fs.rename(dim_p, old_p):
        raise IOError(f"scd2_merge: failed to stage-out {dim_path}")
    if not fs.rename(tmp_p, dim_p):
        # Roll back so the dimension is never left missing.
        fs.rename(old_p, dim_p)
        raise IOError(f"scd2_merge: failed to swap in {tmp}")
    fs.delete(old_p, True)


def compact_partitions(
    spark: SparkSession,
    path: str,
    files_per_partition: int = 1,
) -> None:
    """Small-files compaction: rewrite every year=/month= partition to
    ``files_per_partition`` files.

    Incremental upserts accumulate files per partition (the reference
    appends uuid-suffixed parquet per run, etl/load.py:217-219); at
    scale thousands of small files dominate scan cost via open/footer
    overhead. Dynamic overwrite + repartition on the partition columns
    rewrites each directory in place.
    """
    df = with_partition_columns(
        spark.read.parquet(path).drop("year", "month")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(files_per_partition, "year", "month")
            .write.mode("overwrite")
            .partitionBy("year", "month")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: later equi-joins/aggregations on
    ``bucket_col`` between co-bucketed tables skip the shuffle
    entirely (verify: the join plan has no Exchange). The lake-layer
    answer to 'this join runs every hour on the same key'."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def recover_partitions(spark: SparkSession, table: str) -> None:
    """S13 — partition discovery after external writes
    (MSCK REPAIR equivalent, reference: main.py:63-75)."""
    spark.catalog.recoverPartitions(table)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Layout-optimized parquet: range-repartition on ``sort_cols``
    then sort within each output file before writing. Parquet stores
    per-row-group min/max for every column; this layout makes those
    ranges narrow AND disjoint across files, so point/range
    predicates on the sort key skip whole files and row groups at
    scan time (data skipping — the poor man's Z-order, exact for
    single-key workloads). At 100 TB this is the difference between
    touching every file and touching the one file whose range covers
    the predicate.

    Both steps matter: sortWithinPartitions alone narrows nothing
    when the upstream partitioning is round-robin (every file still
    spans the whole domain — unit-verified), and range partitioning
    alone leaves row groups inside a file unsorted. The range
    exchange is a sampled shuffle, paid once at write time; it
    composes with ``partition_cols`` (Hive pruning first, then
    file/row-group skipping)."""
    out = df.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def zorder_key(cols: Sequence[str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two numeric columns, each
    rank-normalized by the CALLER to [0, 2^bits) ints. Pure bitwise
    codegen (the classic spread-bits ladder, 4 mask steps per
    column) — no UDF.

    Z-order linearizes a 2-D space so that sorting by the key keeps
    BOTH dimensions locally clustered: per-file parquet min/max
    ranges stay narrow in every interleaved column, and predicates on
    either (or both) skip files. A plain lexicographic sort only
    skips on the leading column.
    """
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns")

    def spread(c: Column) -> Column:
        # 16-bit value -> 32-bit with zeros interleaved (even slots).
        # bitwiseOR/AND, not |/& — the Python operators are BOOLEAN
        # or/and on Columns.
        x = c.cast("long")
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                            (2, 0x33333333), (1, 0x55555555)):
            x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
        return x

    a, b = (F.col(c) for c in cols)
    return spread(a).bitwiseOR(F.shiftleft(spread(b), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet over two numeric columns: each column
    is min/max-normalized to ``bits``-bit fixed point (one tiny
    bounds aggregate, broadcast), rows are range-partitioned and
    sorted by the interleaved Morton key, and the key is dropped
    before writing. Upgrades ``write_sorted``'s single-key skipping
    to two dimensions — the standard lakehouse layout (Delta/Iceberg
    OPTIMIZE ZORDER) for two-filter workloads at 100 TB.

    Normalization by observed bounds keeps the key dense regardless
    of the columns' ranges; ties within a bucket are fine (they sort
    adjacent). Skewed columns degrade gracefully — quantile (rank)
    normalization is the upgrade path if a dimension is pathological.

    ``n_files`` pins the range-partition count: an EXPLICIT count is
    exempt from AQE partition coalescing, which otherwise merges a
    small write into one file and erases the layout (skipping needs
    many narrow files). Leave None to let AQE size the write — right
    at production scale, wrong for small benchmarks.
    """
    a, b = cols
    bounds = df.agg(
        F.min(a).alias("_alo"),
        F.max(a).alias("_ahi"),
        F.min(b).alias("_blo"),
        F.max(b).alias("_bhi"),
    )
    top = (1 << bits) - 1

    def norm(c: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        frac = F.when(
            span > 0, (F.col(c) - F.col(lo)) / span
        ).otherwise(F.lit(0.0))
        return F.least(
            F.lit(top), F.floor(frac * (top + 1)).cast("long")
        )

    keyed = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_za", norm(a, "_alo", "_ahi"))
        .withColumn("_zb", norm(b, "_blo", "_bhi"))
        .withColumn("_zkey", zorder_key(["_za", "_zb"], bits))
        .drop("_alo", "_ahi", "_blo", "_bhi", "_za", "_zb")
    )
    ranged = (
        keyed.repartitionByRange(n_files, "_zkey")
        if n_files
        else keyed.repartitionByRange("_zkey")
    )
    (
        ranged.sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: Sequence[str],
    expected_ndv: int = 100_000,
    partition_cols: Sequence[str] = (),
) -> None:
    """Parquet sink with split-block bloom filters on the named
    columns — the file-level structure behind point-lookup data
    skipping (``WHERE user_key = ...``) when min/max row-group stats
    can't prune high-cardinality keys: the reader tests the bloom and
    skips row groups that certainly don't contain the value. This is
    how needle-in-haystack id probes stay sub-scan on a 100 TB lake
    without maintaining a secondary index.

    ``expected_ndv`` sizes the filter (per row group); undersizing
    raises the false-positive rate, which costs wasted reads, never
    correctness.
    """
    w = df.write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def read_lake_evolved(
    spark: SparkSession, path: str, target_schema=None
) -> DataFrame:
    """Schema-evolution-tolerant lake scan: ``mergeSchema`` unions
    the footers of every file generation (columns added by newer
    writers surface as nulls on older files), then optionally
    ``conform``s to a target StructType so downstream operators see
    one stable contract regardless of which era of files a partition
    filter happens to touch.

    This is the read-side answer to column adds — no table rewrite.
    (Type CHANGES of an existing column still need a migration;
    parquet footers with conflicting types fail the merge loudly
    rather than guessing.) Footer merging reads every file's schema,
    so on huge lakes prefer pinning ``target_schema`` from the
    catalog once evolution has settled."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if target_schema is not None:
        df = conform(df, target_schema)
    return df


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CDC-style diff of two table snapshots: one row per key that was
    ``added``, ``removed``, or ``changed`` (unchanged keys are dropped
    — at 100 TB the diff output is the small side, never the
    snapshots). The comparison hashes the tracked columns with md5 of
    a null-tagged concat, so one full outer join on the key is the
    only shuffle and wide rows never travel twice.

    ``compare_cols`` defaults to every non-key column the two
    snapshots share (order-insensitive, name-based). Values are
    length-prefixed before hashing, so nulls, empty strings, and
    values containing the join separator all hash distinctly.

    Output: key columns + change_type ('added'|'removed'|'changed').
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmp_cols = list(compare_cols)

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        # Length-prefixed tokens ('<len>:<value>' or 'N' for null) make
        # the encoding injective: no separator collision ('a\x1f'+'b'
        # vs 'a'+'\x1fb') and no null/sentinel collision (NULL vs a
        # literal sentinel string) can produce the same bytes.
        parts = []
        for c in cmp_cols:
            v = F.col(c).cast("string")
            parts.append(
                F.coalesce(
                    F.concat(F.length(v).cast("string"), F.lit(":"), v),
                    F.lit("N"),
                )
            )
        h = F.md5(F.concat_ws("|", *parts))
        return df.select(*keys, h.alias(f"_h_{tag}"))

    o = hashed(old, "old")
    n = hashed(new, "new")
    joined = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )
