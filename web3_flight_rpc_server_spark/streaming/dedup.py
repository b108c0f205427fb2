"""Stateful streaming dedup (C17 / the A14 seam, improved).

The reference's backfill->realtime transition is at-least-once: rows
arriving during backfill are buffered and drained with NO dedup at the
seam (Subscription.java:131-149; SURVEY.md A14). The Spark-native
improvement is watermarked dedup on the natural key — duplicates
within the lateness bound are dropped, state is evicted as the
watermark passes, so the operator runs forever in bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def watermarked_dedup(df: DataFrame, event_time: str, delay: str,
                      keys: list[str]) -> DataFrame:
    """Exactly-once-within-watermark dedup on the natural key (for
    logs: ["blockNumber", "logIndex"] — the identity the reference's
    seam would need)."""
    return df.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(keys)
