"""Hybrid backfill -> realtime serving (A14; Subscription.java:34-149).

The reference's hybrid mode pages historical data over HTTP while
buffering live WebSocket rows, then drains the buffer and flips state
BACKFILLING -> STREAMING (ordering proven by its
SubscriptionTest.java:124-145: historical batches, then buffered
realtime, then live). Structured Streaming subsumes the machinery —
checkpointed offsets ARE the state machine — so the hybrid plan is:

1. bounded backfill: batch read of [startBlock, latest], delivered
   first (one DataFrame, runs to completion);
2. unbounded tail: a streaming read beginning at the same source,
   filtered to rows ABOVE the backfill high-water mark so the seam is
   exactly-once (improving the reference's at-least-once drain; the
   optional watermarked dedup tightens duplicated-source deliveries).

`run_hybrid` drives both against a sink callback in order, mirroring
the serialized send chain (Subscription.java:151-174) with
foreachBatch's per-query sequential guarantee.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.requests import ClientRequest, RequestMode, logs_row_filter


def _latest_block(batch_logs: DataFrame, block_col: str) -> int:
    """Scalar max-block aggregate playing eth_blockNumber's role
    (LogsService.java:489-500). Cheap: parquet footer min/max stats
    answer it without a full scan."""
    row = batch_logs.agg(F.max(block_col).alias("m")).collect()[0]
    return row.m if row.m is not None else -1


@dataclass
class HybridPlan:
    """The two legs of a hybrid request (either may be None)."""

    backfill: DataFrame | None       # bounded [start, high_water]
    tail: DataFrame | None           # unbounded, rows > high_water
    high_water: int | None           # backfill upper bound (inclusive)


def plan_hybrid(request: ClientRequest, batch_logs: DataFrame,
                stream_logs: DataFrame, block_col: str = "blockNumber",
                latest_block: int | None = None) -> HybridPlan:
    """Split a logs request into backfill + tail legs.

    latest_block plays eth_blockNumber's role (LogsService.java:489-500
    resolves a null endBlock against the node); when None it is
    computed from the batch table (max block)."""
    row_filter = logs_row_filter(request)

    if request.mode is RequestMode.BOUNDED:
        bounded = batch_logs.where(
            (F.col(block_col) >= request.start_block)
            & (F.col(block_col) <= request.end_block)
            & row_filter
        )
        return HybridPlan(backfill=bounded, tail=None, high_water=request.end_block)

    if request.mode is RequestMode.REALTIME:
        # from LATEST only (ClientRequest.java:30-32) — no backfill
        # leg, and the tail is cut at the subscription-time high-water
        # mark: a fresh file/stream-source query replays pre-existing
        # input, which would violate the reference's from-latest-only
        # semantics. Same scalar aggregate that resolves HYBRID's
        # latest (eth_blockNumber's role).
        if latest_block is None:
            latest_block = _latest_block(batch_logs, block_col)
        tail = stream_logs.where(
            (F.col(block_col) > latest_block) & row_filter
        )
        return HybridPlan(backfill=None, tail=tail, high_water=latest_block)

    # HYBRID: backfill [start, latest] then stream rows beyond latest.
    if latest_block is None:
        latest_block = _latest_block(batch_logs, block_col)
    backfill = batch_logs.where(
        (F.col(block_col) >= request.start_block)
        & (F.col(block_col) <= latest_block)
        & row_filter
    )
    tail = stream_logs.where((F.col(block_col) > latest_block) & row_filter)
    return HybridPlan(backfill=backfill, tail=tail, high_water=latest_block)


def run_hybrid(plan: HybridPlan, sink: Callable[[DataFrame, int], None],
               checkpoint_dir: str, await_first_batches: bool = True):
    """Deliver backfill first, then start the streaming tail into the
    same sink via foreachBatch (sequential per query — the analog of
    the reference's one-in-flight send chain). Returns the
    StreamingQuery (or None for a fully bounded plan)."""
    if plan.backfill is not None:
        sink(plan.backfill, -1)  # epoch -1 = the bounded backfill leg
    if plan.tail is None:
        return None
    query = (
        plan.tail.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if await_first_batches:
        query.processAllAvailable()
    return query
