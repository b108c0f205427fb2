"""Custom stateful streaming operator on Spark 4's transformWithState
API (C17/C18 surface): per-contract-address running log statistics.

The reference keeps no per-address state at all — each subscription
re-filters the shared stream (LogsService.java's per-client filter
chain). A per-key running aggregate over an unbounded stream is the
capability its clients build notebook-side (cell 17's value_counts,
re-run per batch); here it is incremental: transformWithStateInPandas
keeps one small ValueState row per address, updates it per
micro-batch, and emits the address's running totals — O(addresses)
state, no re-scan of history, optional TTL so an idle address's state
ages out instead of growing the store forever.

transformWithState vs the older applyInPandasWithState (used by
streaming/reorg.py): typed per-key state handles (value/list/map)
instead of one opaque tuple, explicit timers, and TTL support — the
API Spark 4 positions for new stateful operators; keeping one
operator on each shows both surfaces against the same engine.

ENVIRONMENT GATE: the transformWithState Python protocol speaks
protobuf to the JVM (pyspark/sql/streaming/proto/StateMessage_pb2),
and this container ships no `google.protobuf` — so the operator is
importable and its plan builds, but RUNNING it here raises at stream
start (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The pytest
skips unless protobuf is present; `runtime_available()` reports the
gate. The equivalent semantics (per-key running state with eviction)
are exercised end-to-end by the applyInPandasWithState operator in
streaming/reorg.py, which has no such dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STATS_SCHEMA = "address string, n_logs long, n_batches long, last_block long"


def runtime_available() -> bool:
    """True iff this deployment can actually RUN transformWithState
    (the Python<->JVM state protocol needs google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _processor_cls():
    # Deferred import: pandas + the stateful-processor ABC only exist
    # on the worker/driver paths that actually run the operator.
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AddressStats(StatefulProcessor):
        """Running (n_logs, n_batches, last_block) per address."""

        def __init__(self, ttl_ms: int | None = None):
            self._ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "addr_stats",
                "n_logs LONG, n_batches LONG, last_block LONG",
                ttlDurationMs=self._ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            last = -1
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                last = max(last, int(pdf["blockNumber"].max()))
            prev = self._state.get() if self._state.exists() else (0, 0, -1)
            out = (prev[0] + n, prev[1] + 1, max(prev[2], last))
            self._state.update(out)
            yield pd.DataFrame(
                {
                    "address": [key[0]],
                    "n_logs": [out[0]],
                    "n_batches": [out[1]],
                    "last_block": [out[2]],
                }
            )

        def close(self) -> None:
            pass

    return AddressStats


def address_stats_stream(logs: DataFrame,
                         ttl_ms: int | None = None) -> DataFrame:
    """Per-address running totals over a logs stream; one output row
    per (address, micro-batch) carrying the post-batch running state.
    Output: STATS_SCHEMA. State: one 3-long row per address (TTL'd
    when ttl_ms is set); the stream shuffles once per batch on the
    grouping key, history is never re-read."""
    proc = _processor_cls()(ttl_ms)
    return (
        logs.groupBy("address")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
