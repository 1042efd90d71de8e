"""Bucketed-table layout: pre-shuffled storage for co-located joins
(SURVEY.md §2e "Joins"; 100 TB posture).

A fact-fact equi-join (lineitem⋈orders at 100 TB) shuffles BOTH sides
every query. Bucketing pays that shuffle once at write time: both tables
hash-partitioned into the same bucket count on the join key, so Spark's
planner proves co-location and the join runs with zero Exchange nodes —
per-bucket sort-merge directly on the scans.

This module wraps the saveAsTable/bucketBy path (bucketed layout requires
the session catalog — plain `.parquet()` files carry no bucket metadata)
and a maintenance pass for the other chronic large-table ailment: small
files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed (and per-bucket sorted) on `bucket_col`.

    Matching `num_buckets` + `bucket_col` across tables is the contract
    that later joins on that column need no shuffle. Sorting within
    buckets additionally removes the join's Sort nodes (pure merge-join)
    and improves min/max row-group pruning for range predicates.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket column. With matching
    bucket specs the physical plan has no Exchange on either side — verify
    with plans.num_shuffles(...) == 0 (enforced in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_col: str | None = None,
) -> int:
    """Rewrite a parquet directory into `target_files` files (small-file
    compaction — the chronic ailment of streaming/daily appends: a 100 TB
    table accreted in 10 MB files pays per-file open/footer cost and
    floods the driver's file index).

    Reads, repartitions, writes to a temp dir, then swaps with
    rename-aside ordering: `path`→`old`, `tmp`→`path`, delete `old`. A
    failure between any two steps leaves a complete copy of the data on
    disk under a recoverable name — never a window where the live path is
    missing (delete-then-rename has exactly that window). All filesystem
    calls go through Hadoop's FileSystem API, so the swap works for any
    scheme Spark can read (file:, hdfs:; on s3a: rename is copy+delete —
    non-atomic but still never destroys the only copy).

    Returns the new file count. `sort_col` sorts within partitions for
    row-group pruning.
    """
    from commerce_data_pipeline_spark.sources.hadoopfs import (
        HadoopFS,
        begin_swap,
        swap_dir,
    )

    df = spark.read.parquet(path)
    out = df.repartition(target_files)
    if sort_col:
        out = out.sortWithinPartitions(sort_col)
    live = path.rstrip("/")
    tmp = live + "._compact_tmp"
    old = live + "._compact_old"
    begin_swap(spark, live, tmp, old, what="compact_parquet_dir")
    out.write.mode("overwrite").parquet(tmp)
    swap_dir(spark, live, tmp, old, what="compact_parquet_dir")
    fs = HadoopFS(spark, path)
    return sum(f.endswith(".parquet") for f in fs.listdir(path))
