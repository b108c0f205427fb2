"""Ethereum-logs DataSource tests: paging, pushdown, bisection on
overflow, retry-once, and skip-irreducible-block — the reference's
source resilience semantics (LogsServiceTest.java:527-597, 760-833)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.sources.ethereum_rpc import (
    BlockRangePartition,
    EthereumLogsDataSource,
    EthereumLogsReader,
)

TRANSFER = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(EthereumLogsDataSource)
    return spark


def _read(spark, **options):
    reader = spark.read.format("ethereum_logs")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def test_full_range_read(registered, spark):
    df = _read(spark, startBlock=0, endBlock=99, transport="mock")
    assert df.count() == 200  # 2 logs per block
    assert df.schema.simpleString().startswith("struct<address:string")
    blocks = df.agg(F.min("blockNumber"), F.max("blockNumber")).collect()[0]
    assert (blocks[0], blocks[1]) == (0, 99)


def test_partitions_are_maxblockrange_pages():
    reader = EthereumLogsReader(
        {"startblock": "0", "endblock": "1200", "maxblockrange": "500"}
    )
    pages = reader.partitions()
    assert [(p.start, p.end) for p in pages] == [(0, 499), (500, 999), (1000, 1200)]


def test_filters_pushed_into_transport(registered, spark):
    df = _read(
        spark, startBlock=0, endBlock=99, transport="mock", topics=TRANSFER
    )
    topic0s = {r[0] for r in df.select(F.element_at("topics", 1)).collect()}
    assert topic0s == {TRANSFER}


def test_bisection_recovers_all_rows_under_overflow(registered, spark):
    """With the node refusing ranges producing >40 rows (i.e. >20
    blocks), bisection must still deliver the complete result set."""
    full = _read(spark, startBlock=0, endBlock=99, transport="mock").collect()
    bisected = _read(
        spark, startBlock=0, endBlock=99, transport="mock",
        mockOverflowLimit=40,
    ).collect()
    assert sorted(map(tuple, bisected)) == sorted(map(tuple, full))


def test_irreducible_block_is_skipped():
    """A single block that still overflows is skipped, not fatal
    (LogsService.java:616-624)."""
    reader = EthereumLogsReader(
        {
            "startblock": "0", "endblock": "3", "transport": "mock",
            "mocklogsperblock": "5", "mockoverflowlimit": "4",
        }
    )
    rows = list(reader.read(BlockRangePartition(0, 3)))
    assert rows == []  # every single block exceeds the cap -> all skipped


def test_connection_error_retried_once(registered, spark):
    df = _read(
        spark, startBlock=0, endBlock=9, transport="mock",
        mockFailFirstCall="true",
    )
    assert df.count() == 20  # first call fails, retry succeeds
