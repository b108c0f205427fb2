"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``web3_flight_rpc_server_spark``; this module
just exposes the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from web3_flight_rpc_server_spark.registry import all_queries  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference notebook's headline
    value_counts pattern (scan -> hash agg -> sort) over events."""
    return all_queries()["q_value_counts"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (declared
    queries only; undeclared registry entries stay bench/test-visible
    without consuming the driver's CORRECTNESS window)."""
    return {
        name: q.fn for name, q in all_queries().items() if q.declared
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; queries without one get a rows-only check."""
    return {
        name: q.oracle
        for name, q in all_queries().items()
        if q.declared and q.oracle is not None
    }
