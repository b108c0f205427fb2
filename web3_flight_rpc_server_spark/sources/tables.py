"""Fixture-table loading (the engine's batch storage substrate).

The driver materializes TPC-H-ish parquet tables under
``/root/testdata/sf*/`` (TESTDATA.md). This module is the single place
that knows their quirks:

- ``events.ts`` is INT64 TIMESTAMP(NANOS) in the parquet footer, which
  Spark rejects outright (PARQUET_TYPE_ILLEGAL). We read it as a raw
  ns-long (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a
  microsecond TIMESTAMP_NTZ with pure integer arithmetic —
  ``timestampadd(MICROSECOND, ns div 1000, epoch)`` — so the result is
  independent of the session time zone and bit-identical to DuckDB's
  µs truncation of the same column.

Scale notes: loading is a metadata-only operation (schema from the
footer); Catalyst pushes filters/projections into the parquet scan, so
callers should express predicates on the returned DataFrames and let
pushdown do the IO pruning. At 100 TB the same loader works over a
partitioned table root; nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


# DataFrame handles are pure plan objects; re-building one re-reads the
# parquet footer (~50-100 ms). Memoize per (session, dir, table) so a
# workload of many queries pays footer/schema costs once.
_HANDLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    cached = _HANDLE_CACHE.get(key)
    if cached is not None:
        return cached
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-long -> µs TIMESTAMP_NTZ, time-zone independent.
        df = df.withColumn(
            "ts", F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_EPOCH_NTZ})")
        )
    _HANDLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql use)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
