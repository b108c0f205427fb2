"""Partitioned/bucketed storage layout — the 100 TB substrate.

The reference scopes every source call by block range
(LogsService.java:548-550) because its upstream indexes by block. The
warehouse-native equivalent is HIVE-STYLE PARTITIONING by a coarse
range bucket: a range query then PRUNES whole directories before any
IO (PartitionFilters in the scan), which is the same O(range) — not
O(table) — access path the reference gets from its RPC, but
cluster-wide and planner-driven.

Layout rules that matter at 100 TB:

- partition column = coarse bucket (block_bucket = number div N, or
  dt for time data), NOT the raw key: one directory per value, so the
  key must be low-cardinality (aim for 1-10 GB per partition).
- bucketing (CLUSTERED BY ... INTO n BUCKETS via saveAsTable) on the
  JOIN key removes the shuffle from every subsequent equi-join/agg on
  that key — both sides read co-located buckets. Requires a metastore
  table, so it is exposed here but optional.
- file sizing: target ~128 MB-1 GB parquet files;
  spark.sql.files.maxPartitionBytes splits big files, AQE coalesces
  small tasks. Tiny-file storms are the #1 operational failure of
  partitioned writes — repartition() before write controls the file
  count per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BLOCK_BUCKET = 100_000  # ~2 weeks of Ethereum mainnet blocks


def with_block_bucket(df: DataFrame, block_col: str = "blockNumber",
                      bucket_size: int = DEFAULT_BLOCK_BUCKET) -> DataFrame:
    return df.withColumn(
        "block_bucket", F.expr(f"{block_col} div {bucket_size}")
    )


def write_partitioned_logs(df: DataFrame, path: str,
                           bucket_size: int = DEFAULT_BLOCK_BUCKET,
                           files_per_partition: int = 1) -> None:
    """Write logs hive-partitioned by block bucket. files_per_partition
    caps the small-file count (repartition by the partition column so
    each directory gets exactly that many writers)."""
    bucketed = with_block_bucket(df, bucket_size=bucket_size)
    (
        bucketed.repartition(files_per_partition, "block_bucket")
        .write.mode("overwrite")
        .partitionBy("block_bucket")
        .parquet(path)
    )


def read_block_range(spark: SparkSession, path: str, start: int, end: int,
                     block_col: str = "blockNumber",
                     bucket_size: int = DEFAULT_BLOCK_BUCKET) -> DataFrame:
    """Range read with directory-level pruning: the bucket predicate is
    derivable from the range, so Catalyst prunes partitions BEFORE
    listing files (shows as PartitionFilters in the scan), and the
    per-row range predicate is pushed into the parquet reader."""
    df = spark.read.parquet(path)
    return df.where(
        (F.col("block_bucket") >= start // bucket_size)
        & (F.col("block_bucket") <= end // bucket_size)
        & F.col(block_col).between(start, end)
    )
