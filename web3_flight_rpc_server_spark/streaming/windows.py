"""Streaming windowed aggregation (C14/C15/C16).

The reference's realtime path is windowless fan-out (one Arrow batch
per event, LogsService.java:472-477); windows/watermarks are part of
the committed extension surface. All three builders take any streaming
(or batch — same code path) DataFrame with an event-time column.

Watermark = the late-data policy the reference lacks (its buffered
backfill seam is at-least-once with no lateness bound, A14/C16): rows
later than the delay are dropped, state for closed windows is evicted
— bounded state at unbounded runtime, which is what makes these safe
on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import round4


def _agg_exprs() -> list[Column]:
    return [
        F.count("*").alias("n"),
        round4(F.sum("value")).alias("total_value"),
    ]


def tumbling_agg(events: DataFrame, width: str = "6 hours",
                 watermark: str = "1 hour", key: str = "event_type") -> DataFrame:
    """Non-overlapping event-time buckets per key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), key)
        .agg(*_agg_exprs())
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            key,
            "n",
            "total_value",
        )
    )


def sliding_agg(events: DataFrame, width: str = "6 hours",
                slide: str = "2 hours", watermark: str = "1 hour",
                key: str = "event_type") -> DataFrame:
    """Overlapping windows: each row lands in width/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide), key)
        .agg(*_agg_exprs())
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            key,
            "n",
            "total_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "1 hour", key: str = "user_id") -> DataFrame:
    """Data-driven session windows (gap-based close), the streaming
    twin of the batch q_sessionize query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), key)
        .agg(*_agg_exprs())
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key,
            "n",
            "total_value",
        )
    )
