"""Stream enrichment joins over the logs/blocks pair.

Two Structured Streaming join shapes the engine exposes that the
reference leaves to its notebook clients (clients receive raw rows and
join logs to blocks by number on their side — SURVEY §2B): moving the
join into the engine makes it a declared, scale-planned operator.

- stream-static: each logs micro-batch broadcast-joins the bounded
  blocks dimension. No join state, no stream-side shuffle — the dim
  re-resolves per batch (so a refreshed dim table is picked up) and
  broadcasting keeps the 100 TB stream path shuffle-free.
- stream-stream: logs stream joined to the blocks stream on
  blockNumber with BOTH sides watermarked and an event-time range
  bound, so Spark evicts join state as watermarks advance — bounded
  state at unbounded runtime. Event time derives from the chain's
  ~12 s/block cadence (the same mapping reorg/windows use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Chain cadence used to map block numbers onto an event-time axis
# (mainnet ~12 s/block; LogsService.java:265-266 heartbeat comment).
_SECONDS_PER_BLOCK = 12

_DIM_COLS = ("number", "timestamp", "miner", "gasUsed", "gasLimit")


def enrich_logs_with_blocks(logs: DataFrame, blocks: DataFrame,
                            how: str = "left") -> DataFrame:
    """Stream-static enrichment: logs (streaming or batch) gain their
    block's timestamp/miner/gas columns via a broadcast join on
    blockNumber. Left join by default — a log whose block row is not
    (yet) in the dim must not be dropped."""
    dim = blocks.select(
        F.col("number").alias("__blk_number"),
        F.col("timestamp").alias("block_timestamp"),
        F.col("miner").alias("block_miner"),
        F.col("gasUsed").alias("block_gas_used"),
        F.col("gasLimit").alias("block_gas_limit"),
    )
    return logs.join(
        F.broadcast(dim),
        logs["blockNumber"] == dim["__blk_number"],
        how,
    ).drop("__blk_number")


def join_logs_blocks_streams(logs: DataFrame, blocks: DataFrame,
                             delay: str = "60 seconds") -> DataFrame:
    """Stream-stream inner join with bounded state: both sides get an
    event-time column from the block cadence and a watermark of
    ``delay``; the join condition carries the equality key AND an
    event-time equality bound, which is what lets Spark drop each
    side's buffered rows once the other side's watermark passes them.
    """
    l = logs.withColumn(
        "log_event_ts",
        F.timestamp_seconds(F.col("blockNumber") * _SECONDS_PER_BLOCK),
    ).withWatermark("log_event_ts", delay)
    b = blocks.select(
        F.col("number").alias("__blk_number"),
        F.col("timestamp").alias("block_timestamp"),
        F.col("miner").alias("block_miner"),
        F.col("gasUsed").alias("block_gas_used"),
    ).withColumn(
        "blk_event_ts",
        F.timestamp_seconds(F.col("__blk_number") * _SECONDS_PER_BLOCK),
    ).withWatermark("blk_event_ts", delay)
    return l.join(
        b,
        (l["blockNumber"] == b["__blk_number"])
        & (l["log_event_ts"] == b["blk_event_ts"]),
        "inner",
    ).drop("__blk_number")
