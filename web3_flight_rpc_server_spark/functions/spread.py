"""Scale-adaptive pre-explode repartitioning.

A compact parquet corpus arrives as 1-2 scan partitions (128 MB
splits), so an explode-heavy map pass (feature hashing, window
hashing, paragraph/word explodes) runs on 1-2 cores while the rest
idle — measured 9.2 -> 1.2 s for the DSIR feature pass at sf1 (r14
optimization round). The fix is a round-robin repartition of the
pre-explode document rows: the shuffle moves corpus bytes once,
before the 20-100x blowup.

But the exchange is not free: on a corpus small enough that the
single-threaded explode finishes in tens of milliseconds, the extra
stage + 32-task scheduling costs MORE than it buys (measured +0.4 s
on q_paragraph_dedup at sf0.1 when applied unconditionally). So the
repartition is gated on the OPTIMIZER'S size estimate of the input —
for parquet scans this is file bytes, available at plan-build time
with no job. Below ``min_bytes`` (default 1 MB of COMPRESSED,
column-pruned plan bytes — text parquet compresses ~10-20x, so this
is roughly 10-20 MB of explode input, around a second of
single-threaded work) the input passes through untouched; above it,
it spreads to defaultParallelism. Calibration: the sf0.1 documents
projection estimates ~250 KB (where the unconditional exchange
measured a +0.4 s regression) and sf1 ~2.5 MB (where it measured
6-8x); the floor separates the two with margin. On a real cluster
large inputs arrive as many splits and the estimate is far above
the floor either way, so the behavior degenerates to the
unconditional repartition these operators shipped with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SPREAD_MIN_BYTES = 1 << 20


def spread(df: DataFrame, min_bytes: int = SPREAD_MIN_BYTES) -> DataFrame:
    """Round-robin ``df`` to defaultParallelism when its plan-time
    size estimate is at least ``min_bytes``; pass through untouched
    below (or repartition anyway if no estimate is obtainable — the
    conservative pre-r14 behavior)."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        est = None
    if est is not None and est < min_bytes:
        return df
    return df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
