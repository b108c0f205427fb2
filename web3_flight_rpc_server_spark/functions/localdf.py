"""Driver-local rows -> DataFrame without the default-parallelism tax.

``spark.createDataFrame(rows, schema)`` parallelizes the rows into
``defaultParallelism`` slices (32 on the bench profile), and every
downstream materialization of that frame pays one Python-worker
round-trip PER SLICE — serially, when the consumer is a coalesced
write or a broadcast build. Measured on the bench box (r14
optimization round, guide §4.1 "you control how many columns/batches
cross the boundary"): writing a 1,285-row weight table cost 4.3-7.6 s
through the 32-slice frame and 0.3 s through a single-slice one; a
broadcast-join build against a 97-row local frame dropped 0.47 s ->
0.30 s. Slicing small local tables to ~1 partition removes that cost
while keeping the EXACT createDataFrame(list) semantics — same pickle
serialization, same per-row schema conversion, no Arrow/pandas type
coercion differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# One slice comfortably holds any driver-bounded table this engine
# builds (model weights, centroids, offsets, manifests — all << 50k
# rows); the ceiling only guards a pathological caller.
_ROWS_PER_SLICE = 50_000


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with the slice count
    derived from the data (>=1) instead of defaultParallelism."""
    rows = rows if isinstance(rows, list) else list(rows)
    n_slices = max(1, len(rows) // _ROWS_PER_SLICE)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
