"""Partition-pruning verification: the block-bucket layout must prune
directories at plan time (PartitionFilters), the scale substrate for
the reference's block-range access pattern."""

from __future__ import annotations

from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA
from web3_flight_rpc_server_spark.sources.partitioned import (
    read_block_range,
    write_partitioned_logs,
)


def _logs(spark, n=2000):
    rows = [
        (f"0x{i % 7}", "0x", [f"0xT{i % 3}"], i, f"h{i}", 0, f"b{i}", i % 5, False)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, LOGS_SCHEMA)


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "logs_part")
    write_partitioned_logs(_logs(spark), path, bucket_size=500)

    df = read_block_range(spark, path, 600, 1100, bucket_size=500)
    got = sorted(r.blockNumber for r in df.collect())
    assert got == list(range(600, 1101))

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # buckets 0 and 3 (blocks 0-499, 1500-1999) must not be listed
    assert "block_bucket=0/" not in plan


def test_partition_count_matches_buckets(spark, tmp_path):
    import os

    path = str(tmp_path / "logs_part2")
    write_partitioned_logs(_logs(spark, 1000), path, bucket_size=250)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("block_bucket="))
    assert dirs == [f"block_bucket={i}" for i in range(4)]
    # files_per_partition=1: exactly one parquet file per directory
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1


def test_dynamic_partition_pruning_on_bucket_join(spark, tmp_path):
    # DPP: when the pruning predicate only exists on the DIM side, the
    # fact's PartitionFilters gets a dynamicpruning subquery fed by the
    # dim's broadcast — directories are skipped at RUNTIME, the
    # planner-native form of the reference's block-range scoping for
    # joins (SURVEY.md section 4, partition pruning row).
    from pyspark.sql import functions as F

    path = str(tmp_path / "logs_dpp")
    write_partitioned_logs(_logs(spark), path, bucket_size=500)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(b, f"era{b}") for b in range(4)], "block_bucket INT, era STRING"
    ).where(F.col("era") == "era2")
    joined = fact.join(dim, "block_bucket")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:1500]
    assert sorted(set(r.blockNumber for r in joined.collect())) == list(
        range(1000, 1500)
    )
