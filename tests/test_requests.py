"""Request-model tests mirroring the reference's service tests
(LogsServiceTest / BlocksServiceTest / SubscriptionTest behaviors that
concern the bounded surface)."""

from __future__ import annotations

import pytest

from web3_flight_rpc_server_spark.plans import (
    ClientRequest,
    RequestMode,
    plan_request,
)
from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA


LOG_ROWS = [
    # address, data, topics, blockNumber, txHash, txIdx, blockHash, logIdx, removed
    ("0xAAA", "0x", ["0xT1", "0xE1"], 10, "h1", 0, "b1", 0, False),
    ("0xbbb", "0x", ["0xT2"], 20, "h2", 1, "b2", 1, False),
    ("0xccc", "0x", [], 30, "h3", 2, "b3", 2, False),      # empty topics
    ("0xAAA", "0x", ["0xT3"], 40, "h4", 3, "b4", 3, True),
    (None, "0x", None, 50, "h5", 4, "b5", 4, False),        # null topics
]


@pytest.fixture()
def logs_df(spark):
    return spark.createDataFrame(LOG_ROWS, LOGS_SCHEMA)


def test_mode_selection_from_json():
    # ClientRequest.java:30-36 nullness table (SURVEY.md §1.3)
    cases = [
        ('{"dataset":"logs","startBlock":0,"endBlock":100}', RequestMode.BOUNDED),
        ('{"dataset":"logs","startBlock":"5"}', RequestMode.HYBRID),
        ('{"dataset":"logs"}', RequestMode.REALTIME),
        ('{"dataset":"blocks","endBlock":7}', RequestMode.DEGENERATE),
    ]
    for ticket, mode in cases:
        assert ClientRequest.from_json(ticket).mode is mode


def test_cursor_accepts_string_and_number():
    # Producer.java:74-79: BigInteger from JSON number or string
    r = ClientRequest.from_json('{"dataset":"blocks","startBlock":"12","endBlock":34}')
    assert (r.start_block, r.end_block) == (12, 34)


def test_unknown_dataset_rejected():
    with pytest.raises(ValueError, match="unknown dataset"):
        ClientRequest.from_json('{"dataset":"receipts"}')


def test_bounded_range_is_inclusive(spark, logs_df):
    # LogsService pages inclusive [start,end] (LogsService.java:507-523)
    req = ClientRequest("logs", 20, 40)
    got = sorted(r.blockNumber for r in plan_request(req, logs=logs_df).collect())
    assert got == [20, 30, 40]


def test_address_filter_case_insensitive(spark, logs_df):
    # LogSubscription.java:43-45 equalsIgnoreCase
    req = ClientRequest("logs", 0, 100, contract_addresses=["0xaaa"])
    got = sorted(r.blockNumber for r in plan_request(req, logs=logs_df).collect())
    assert got == [10, 40]


def test_topic0_quirk_empty_topics_pass(spark, logs_df):
    # LogSubscription.java:40-42: only topics[0] tested; empty topics
    # passes ANY topics filter. Null topics treated like empty
    # (documented deviation; fixtures never produce null topics).
    req = ClientRequest("logs", 0, 100, topics=["0xT1"])
    got = sorted(r.blockNumber for r in plan_request(req, logs=logs_df).collect())
    assert got == [10, 30, 50]  # match, empty-topics row, null-topics row
    # topic beyond slot 0 does NOT match ("0xE1" is topics[1] of row 1)
    req2 = ClientRequest("logs", 0, 100, topics=["0xE1"])
    got2 = sorted(r.blockNumber for r in plan_request(req2, logs=logs_df).collect())
    assert got2 == [30, 50]  # only the empty/null-topics escape hatch


def test_degenerate_logs_returns_nothing(spark, logs_df):
    # start=null => canFetchHistoricalData false (LogsService.java:505)
    req = ClientRequest("logs", None, 30)
    assert plan_request(req, logs=logs_df).count() == 0


def test_degenerate_blocks_defaults_start_to_end(spark):
    # BlocksService.java:106: start := end -> exactly one block
    blocks = spark.createDataFrame(
        [(n,) for n in range(5, 10)], "number long"
    )
    req = ClientRequest("blocks", None, 7)
    got = [r.number for r in plan_request(req, blocks=blocks).collect()]
    assert got == [7]


def test_streaming_modes_refused_on_bounded_planner(spark, logs_df):
    for ticket in ('{"dataset":"logs","startBlock":1}', '{"dataset":"logs"}'):
        req = ClientRequest.from_json(ticket)
        with pytest.raises(ValueError, match="unbounded"):
            plan_request(req, logs=logs_df)
