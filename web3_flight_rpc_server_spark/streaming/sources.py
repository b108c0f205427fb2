"""Streaming sources.

The reference's realtime sources are WebSocket subscriptions
(eth_subscribe('logs', filter) — LogsService.java:391-426;
blockFlowable — BlocksService.java:81-90). The Spark-native equivalent
is any Structured Streaming source; for the synthetic pipeline the
file source over a directory of parquet drops plays the role of the
socket: each new file is a push event, `maxFilesPerTrigger` is the
admission control that mirrors the reference's page-size throttle
(A12, LogsService.java:507-523).

One shared upstream, per-query exact filters (the reference's
filter-union trick, LogsService.java:353-389/428-470): in Spark every
query gets its own plan over the same source, so the coarse-union
step is unnecessary — each client query applies logs_row_filter
directly and reads the shared directory/bus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure

# events.parquet stores ts as INT64 TIMESTAMP(NANOS); the streaming
# reader needs an explicit schema, so mirror the nanosAsLong read the
# batch loader does (sources/tables.py) and rebuild µs NTZ.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # ns since epoch
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

def events_stream(spark: SparkSession, dir_path: str,
                  max_files_per_trigger: int | None = 1) -> DataFrame:
    """Unbounded events: file-source stream over parquet drops. Unlike
    the batch loader's TIMESTAMP_NTZ (DuckDB-oracle parity), streaming
    event time must be TIMESTAMP — watermarks reject NTZ — so ts
    becomes a µs instant (session tz is pinned UTC by configure())."""
    configure(spark)
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(dir_path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def logs_stream(spark: SparkSession, dir_path: str,
                schema=None, max_files_per_trigger: int | None = 1) -> DataFrame:
    """Unbounded logs in the canonical 9-field schema (schemas.py),
    file-source based; per-query predicates (plans.logs_row_filter)
    are applied by the caller — exact per-client filtering, as in
    LogSubscription.java:36-49."""
    from ..schemas import LOGS_SCHEMA

    configure(spark)
    reader = spark.readStream.schema(schema or LOGS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(dir_path)
