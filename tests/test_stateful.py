"""transformWithState per-address running stats (streaming/stateful.py):
state accumulates across micro-batches and emits post-batch totals.

The end-to-end case needs google.protobuf (the transformWithState
Python<->JVM state protocol); without it we still assert the plan
builds and the gate reports honestly."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA
from web3_flight_rpc_server_spark.streaming.sources import logs_stream
from web3_flight_rpc_server_spark.streaming.stateful import (
    address_stats_stream,
    runtime_available,
)


def _write_logs(spark, dir_path, rows):
    spark.createDataFrame(rows, LOGS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dir_path)


def _log_row(addr, block, idx):
    return (addr, "0x", ["0xT1"], block, f"h{block}", 0, f"b{block}", idx, False)


def test_plan_builds_and_schema_is_stable(spark, tmp_path):
    """The operator's unbound plan must construct regardless of the
    protobuf gate (schema contract + groupBy key wiring)."""
    src = str(tmp_path / "src")
    _write_logs(spark, src, [_log_row("0xA", 1, 0)])
    df = address_stats_stream(logs_stream(spark, src))
    assert df.isStreaming
    assert [f.name for f in df.schema] == [
        "address", "n_logs", "n_batches", "last_block",
    ]


@pytest.mark.skipif(
    not runtime_available(),
    reason="transformWithState needs google.protobuf (not in this env)",
)
def test_running_stats_accumulate_across_batches(spark, tmp_path):
    # transformWithState requires the RocksDB state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    # batch 1: two logs for A, one for B
    _write_logs(
        spark, src,
        [_log_row("0xA", 1, 0), _log_row("0xA", 2, 0), _log_row("0xB", 3, 0)],
    )
    q = (
        address_stats_stream(logs_stream(spark, src, max_files_per_trigger=None))
        .writeStream.format("memory").queryName("addr_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.address: r
            for r in spark.sql("SELECT * FROM addr_stats").collect()
        }
        assert first["0xA"].n_logs == 2 and first["0xA"].last_block == 2
        assert first["0xB"].n_logs == 1 and first["0xB"].last_block == 3

        # batch 2: one more log for A -> running totals, not per-batch
        _write_logs(spark, src, [_log_row("0xA", 9, 0)])
        q.processAllAvailable()
        rows = [
            r for r in spark.sql("SELECT * FROM addr_stats").collect()
            if r.address == "0xA"
        ]
        latest = max(rows, key=lambda r: r.n_batches)
        assert latest.n_logs == 3, rows
        assert latest.n_batches == 2
        assert latest.last_block == 9
    finally:
        q.stop()
