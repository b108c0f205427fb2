"""Reorg handling: the `removed` flag as retraction (C17).

The reference carries the chain-reorg `removed` flag through to the
client and never acts on it (Converter.java:169 copies it; no consumer
reads it). The Spark-native completion of that story: a stateful
operator keeping the LATEST version of each log keyed by
(blockNumber, logIndex); a removed=true arrival retracts the key, a
subsequent re-emission (the log re-appearing on the canonical chain)
reinstates it.

Implemented with applyInPandasWithState. State boundedness: when the
input carries an event-time watermark (pass ``watermark_delay``), each
key arms an event-time timeout at the current watermark + delay; keys
untouched past that horizon are EVICTED with a final tombstone row
(is_removed preserved, version=-1 marks the eviction emission) —
only the reorg-mutable tail of the chain stays resident. Without a
watermark the operator runs with NoTimeout (bounded corpora / tests).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_INTERVAL_MS = {
    "millisecond": 1, "second": 1_000, "minute": 60_000,
    "hour": 3_600_000, "day": 86_400_000,
}


def _delay_to_ms(delay: str) -> int:
    """Parse a Spark-style interval string ('10 seconds', '1 minute')
    into milliseconds for setTimeoutTimestamp."""
    value, unit = delay.strip().split()
    return int(float(value) * _INTERVAL_MS[unit.lower().rstrip("s")])

OUTPUT_SCHEMA = (
    "blockNumber bigint, logIndex int, address string, data string, "
    "transactionHash string, is_removed boolean, version int"
)
STATE_SCHEMA = (
    "address string, data string, transactionHash string, "
    "is_removed boolean, version int"
)


def latest_log_state(logs: DataFrame, watermark_delay: str | None = None,
                     event_time_col: str = "event_ts") -> DataFrame:
    """Streaming keep-latest per (blockNumber, logIndex) honoring the
    removed flag; each micro-batch emits the keys it touched with
    their current canonical state (update-mode semantics).

    The state function is a local closure ON PURPOSE: cloudpickle then
    serializes it by value, so Python workers don't need this package
    on their import path (a module-level function is pickled by
    reference and breaks any deployment that only extends the driver's
    sys.path)."""
    use_timeout = watermark_delay is not None
    if use_timeout:
        logs = logs.withWatermark(event_time_col, watermark_delay)
        eviction_ms = _delay_to_ms(watermark_delay)

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if use_timeout and state.hasTimedOut:
            # horizon passed with no new versions: evict, emit tombstone
            addr, data, tx, removed, version = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "blockNumber": key[0],
                        "logIndex": key[1],
                        "address": addr,
                        "data": data,
                        "transactionHash": tx,
                        "is_removed": removed,
                        "version": -1,
                    }
                ]
            )
            return
        addr, data, tx, removed, version = (
            state.get if state.exists else (None, None, None, False, 0)
        )
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                version += 1
                removed = bool(row.removed)
                if not removed:
                    addr, data, tx = row.address, row.data, row.transactionHash
        state.update((addr, data, tx, removed, version))
        if use_timeout:
            # evict at watermark + the caller's configured lateness
            # bound (not a fixed horizon) — the documented contract
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + eviction_ms
            )
        yield pd.DataFrame(
            [
                {
                    "blockNumber": key[0],
                    "logIndex": key[1],
                    "address": addr,
                    "data": data,
                    "transactionHash": tx,
                    "is_removed": removed,
                    "version": version,
                }
            ]
        )

    return (
        logs.groupBy("blockNumber", "logIndex")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if use_timeout else GroupStateTimeout.NoTimeout
            ),
        )
    )
