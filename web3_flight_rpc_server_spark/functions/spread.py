"""Scale-adaptive pre-explode repartitioning.

A compact parquet corpus can arrive as 1-2 scan partitions, so an
explode-heavy map pass (feature hashing, window hashing, paragraph/
word explodes) runs on 1-2 cores while the rest idle — measured
9.2 -> 1.2 s for the DSIR feature pass at sf1 (r14 optimization
round). The fix is a round-robin repartition of the pre-explode
document rows: the shuffle moves corpus bytes once, before the
20-100x blowup.

But the exchange is not free, so it is gated on two plan-time
signals (no job runs for either):

- the OPTIMIZER'S size estimate — on a corpus small enough that the
  single-threaded explode finishes in milliseconds, the extra stage
  + 32-task scheduling costs more than it buys (measured +0.4 s on
  q_paragraph_dedup at sf0.1 when unconditional). Floor: 1 MB of
  compressed, column-pruned plan bytes (~10-20 MB of text). The
  sf0.1 documents projection estimates ~250 KB (skip — plan
  byte-identical to pre-r14), sf1 ~2.5 MB (spread; 3-8x measured).
- the PHYSICAL partition count — an input that already splits into
  >= defaultParallelism partitions (many files / row groups on a
  real cluster) parallelizes by itself, and repartitioning it would
  be a pointless full shuffle. The sf10 tier (15 row-group splits
  on 32 cores) measured q_dsir 2x FASTER with the spread and
  q_perplexity within noise either way, so under-parallel inputs
  spread all the way up to the core count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SPREAD_MIN_BYTES = 1 << 20


def spread(df: DataFrame, min_bytes: int = SPREAD_MIN_BYTES) -> DataFrame:
    """Round-robin ``df`` to defaultParallelism when its plan-time
    size estimate clears ``min_bytes`` and it arrives in fewer
    physical partitions than defaultParallelism; pass through
    untouched otherwise (or repartition if a signal is not
    obtainable — the conservative pre-r14 behavior)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if est < min_bytes:
            return df
    except Exception:
        pass
    try:
        if df.rdd.getNumPartitions() >= p:
            return df
    except Exception:
        pass
    return df.repartition(p)
