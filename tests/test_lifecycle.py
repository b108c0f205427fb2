"""A16 lifecycle: registry observes start/progress/termination, and
state eviction bounds the reorg operator when a watermark is present."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA
from web3_flight_rpc_server_spark.streaming.lifecycle import QueryRegistry
from web3_flight_rpc_server_spark.streaming.reorg import latest_log_state
from web3_flight_rpc_server_spark.streaming.sources import logs_stream


def _write_logs(spark, dir_path, rows):
    spark.createDataFrame(rows, LOGS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dir_path)


def _log_row(block, idx, removed=False):
    return ("0xaaa", "0x", ["0xT1"], block, f"h{block}", 0, f"b{block}", idx, removed)


def test_registry_tracks_start_progress_termination(spark, tmp_path):
    registry = QueryRegistry().attach(spark)
    src = str(tmp_path / "src")
    _write_logs(spark, src, [_log_row(1, 0)])
    q = (
        logs_stream(spark, src)
        .writeStream.format("memory").queryName("lifecycle_q")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # listener bus is async; give it a moment
    deadline = time.time() + 10
    while time.time() < deadline:
        recs = [r for r in registry.records.values() if r.name == "lifecycle_q"]
        if recs and recs[0].terminated:
            break
        time.sleep(0.2)
    registry.detach(spark)
    assert recs and recs[0].terminated and recs[0].exception is None
    assert recs[0].progress_count >= 1


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """A19's replacement argument, demonstrated: the reference keeps a
    WSS subscription alive with heartbeats + exponential-backoff
    reconnect (LogsService.java:264-351); here the same resilience
    contract — no loss, no duplicates across a connection death — is
    carried by Structured Streaming checkpoint-restart. Kill the query
    mid-stream, append more source data while it is down, restart an
    identical query from the same checkpoint, and the file sink holds
    exactly one copy of every row."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            logs_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    _write_logs(spark, src, [_log_row(b, 0) for b in (1, 2, 3)])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # the "connection death"

    # source keeps producing while the query is down
    _write_logs(spark, src, [_log_row(b, 0) for b in (4, 5, 6)])
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(
        r.blockNumber for r in spark.read.parquet(out).collect()
    )
    assert got == [1, 2, 3, 4, 5, 6], got


def test_reorg_state_eviction_with_watermark(spark, tmp_path):
    """With a watermark, keys past the horizon are evicted and emit a
    version=-1 tombstone (bounded state, C17)."""
    src = str(tmp_path / "src")
    _write_logs(spark, src, [_log_row(1, 0)])
    stream = logs_stream(spark, src).withColumn(
        "event_ts", F.timestamp_seconds(F.col("blockNumber") * 12)
    )
    q = (
        latest_log_state(stream, watermark_delay="10 seconds")
        .writeStream.outputMode("update")
        .format("memory").queryName("evict_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark far past block 1's event time
        _write_logs(spark, src, [_log_row(100000, 0)])
        q.processAllAvailable()
        _write_logs(spark, src, [_log_row(100001, 0)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM evict_out WHERE blockNumber = 1"
        ).collect()
        versions = sorted(r.version for r in rows)
        assert versions[0] == -1, f"expected eviction tombstone, got {versions}"
    finally:
        q.stop()
