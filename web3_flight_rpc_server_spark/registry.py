"""Declared-query registry: one entry per operator from SURVEY.md §2.

Each query is a (spark_fn, oracle_sql) pair. The spark_fn builds the
DataFrame plan; the oracle is the ANSI-SQL twin DuckDB runs on the same
parquet tables for the driver's correctness gate. Queries whose
semantics DuckDB cannot express (approx sketches, UDF internals,
streaming state) register with ``oracle=None`` -> rows-only check.

Determinism contract (FIXTURES.md): every float aggregate is rounded
identically on both sides, every LIMIT carries a total order, and every
computed column is aliased to the same name in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only
    doc: str
    declared: bool = True  # False -> bench/test-visible, not driver-declared


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None,
          declared: bool = True) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query under ``name``.

    ``declared=False`` keeps the query runnable by name (bench.py,
    tests) without counting against the driver's 50-entry
    CORRECTNESS window."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name, fn, oracle, (fn.__doc__ or "").strip(), declared
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import for side effect: populates REGISTRY.
    from . import queries  # noqa: F401

    return dict(REGISTRY)
