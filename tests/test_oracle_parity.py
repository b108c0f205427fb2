"""Every oracle-backed declared query must match its DuckDB twin at the
test scale factor; rows-only queries must at least execute and return a
stable schema. This mirrors the driver's correctness gate locally."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.registry import all_queries

from .oracle_harness import compare, duckdb_connection

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, sf_dir, con):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        rows = df.limit(1000).collect()
        assert df.columns, f"{name}: no columns"
        assert rows is not None
        return
    problems = compare(df, con, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
