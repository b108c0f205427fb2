"""Bucketed tables: shuffle-free co-located joins (the 100 TB lever
for fact-fact joins).

Broadcast covers dim joins; when BOTH sides are big (lineitem x
orders at scale), the sort-merge join shuffles both. Writing each
side bucketed on the join key (CLUSTERED BY ... INTO n BUCKETS via
saveAsTable) pins an identical hash partitioning into the table
layout, so every later equi-join or aggregation on that key reads
co-located buckets with ZERO exchange — the plan drops both shuffle
nodes. This is the storage-level analog of what the reference cannot
do at all (its joins are client-side pandas merges, notebook cell 22).

Requires a metastore-backed table (local Derby in tests; any Hive
metastore in production). Bucket counts must match across co-joined
tables and should be sized so a bucket is 100 MB - 1 GB at the target
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort_by: str | None = None) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket)
    metastore table. Sorting by the key additionally removes the
    sort from later sort-merge joins."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matched
    bucket specs Catalyst plans SortMergeJoin WITHOUT Exchange on
    either side (verify: no 'Exchange hashpartitioning' above the
    scans in .explain())."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
