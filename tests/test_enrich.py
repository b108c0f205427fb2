"""Stream enrichment joins (streaming/enrich.py): stream-static
broadcast enrichment and watermark-bounded stream-stream join."""

from __future__ import annotations

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.schemas import BLOCKS_SCHEMA, LOGS_SCHEMA
from web3_flight_rpc_server_spark.streaming.enrich import (
    enrich_logs_with_blocks,
    join_logs_blocks_streams,
)
from web3_flight_rpc_server_spark.streaming.sources import logs_stream


def _log_row(block, idx):
    return ("0xaaa", "0x", ["0xT1"], block, f"h{block}", 0, f"b{block}", idx, False)


def _block_row(number):
    return {
        "number": number,
        "hash": f"b{number}",
        "miner": f"m{number % 3}",
        "gasUsed": 21000 * number,
        "gasLimit": 30_000_000,
        "timestamp": 1_700_000_000 + 12 * number,
    }


def _write_logs(spark, dir_path, rows):
    spark.createDataFrame(rows, LOGS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dir_path)


def _blocks_df(spark, numbers):
    return spark.createDataFrame([_block_row(n) for n in numbers], BLOCKS_SCHEMA)


def test_stream_static_enrichment_broadcasts_and_keeps_unmatched(spark, tmp_path):
    src = str(tmp_path / "logs")
    _write_logs(spark, src, [_log_row(1, 0), _log_row(2, 0), _log_row(9, 0)])
    blocks = _blocks_df(spark, [1, 2])  # block 9's dim row missing
    enriched = enrich_logs_with_blocks(logs_stream(spark, src), blocks)
    q = (
        enriched.writeStream.format("memory").queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.blockNumber: r for r in spark.sql("SELECT * FROM enriched").collect()}
    assert set(rows) == {1, 2, 9}
    assert rows[1].block_miner == "m1" and rows[1].block_timestamp == 1_700_000_012
    assert rows[2].block_gas_used == 42000
    assert rows[9].block_miner is None, "left join must keep dim-less logs"
    # batch-mode twin (same function, bounded input) must broadcast
    batch = enrich_logs_with_blocks(
        spark.createDataFrame([_log_row(1, 0)], LOGS_SCHEMA), blocks
    )
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_stream_stream_join_matches_and_bounds_state(spark, tmp_path):
    logs_dir = str(tmp_path / "logs")
    blocks_dir = str(tmp_path / "blocks")
    _write_logs(spark, logs_dir, [_log_row(b, 0) for b in (1, 2, 3)])
    _blocks_df(spark, [1, 2, 3]).coalesce(1).write.mode("append").parquet(
        blocks_dir
    )
    blocks_stream = (
        spark.readStream.schema(BLOCKS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(blocks_dir)
    )
    joined = join_logs_blocks_streams(
        logs_stream(spark, logs_dir), blocks_stream
    )
    # watermark-bounded state must be visible in the unresolved plan
    q = (
        joined.writeStream.format("memory").queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # late arrivals on both sides within the watermark still join
        _write_logs(spark, logs_dir, [_log_row(4, 0)])
        _blocks_df(spark, [4]).coalesce(1).write.mode("append").parquet(
            blocks_dir
        )
        q.processAllAvailable()
        got = {
            (r.blockNumber, r.block_miner)
            for r in spark.sql("SELECT * FROM ss_join").collect()
        }
        assert got == {(b, f"m{b % 3}") for b in (1, 2, 3, 4)}
        progress = q.lastProgress
    finally:
        q.stop()
    # the stateful join operator reports (and therefore evicts) state
    ops = progress["stateOperators"]
    assert any("Join" in (op.get("operatorName") or "") for op in ops), ops
