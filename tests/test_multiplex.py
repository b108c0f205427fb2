"""A7 filter-union semantics, mirroring the reference's
LogsServiceTest wildcard/union cases (LogsServiceTest.java:211-282)."""

from __future__ import annotations

from web3_flight_rpc_server_spark.plans import ClientRequest
from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA
from web3_flight_rpc_server_spark.streaming.multiplex import (
    multiplex,
    union_upstream_filter,
)

ROWS = [
    ("0xaaa", "0x", ["0xT1"], 1, "h1", 0, "b1", 0, False),
    ("0xbbb", "0x", ["0xT2"], 2, "h2", 0, "b2", 0, False),
    ("0xccc", "0x", ["0xT3"], 3, "h3", 0, "b3", 0, False),
]


def _req(addrs=None, topics=None):
    return ClientRequest("logs", 0, 100, contract_addresses=addrs, topics=topics)


def test_union_dedups_across_clients():
    # LogsServiceTest.java:247-282: address/topic union is deduped
    up = union_upstream_filter([
        _req(addrs=["0xAAA", "0xbbb"], topics=["0xT1"]),
        _req(addrs=["0xaaa"], topics=["0xT1", "0xT2"]),
    ])
    assert up == {
        "contractAddresses": ["0xaaa", "0xbbb"],
        "topics": ["0xT1", "0xT2"],
    }


def test_any_unfiltered_client_degrades_dimension_to_wildcard():
    # LogsServiceTest.java:211-245: one unfiltered client -> wildcard;
    # dimensions degrade independently
    up = union_upstream_filter([
        _req(addrs=["0xaaa"], topics=["0xT1"]),
        _req(addrs=None, topics=["0xT2"]),
    ])
    assert up == {"topics": ["0xT1", "0xT2"]}  # addresses wildcarded
    assert union_upstream_filter([_req(), _req(addrs=["0xaaa"])]) is None


def test_multiplex_per_client_exact(spark):
    shared = spark.createDataFrame(ROWS, LOGS_SCHEMA)
    outs = multiplex(shared, {
        "c1": _req(addrs=["0xAAA"]),
        "c2": _req(topics=["0xT2"]),
    })
    assert sorted(r.blockNumber for r in outs["c1"].collect()) == [1]
    assert sorted(r.blockNumber for r in outs["c2"].collect()) == [2]


def test_coarse_union_never_drops_a_client_row(spark):
    """The invariant the reference's design depends on: the upstream
    union filter passes every row any client wants."""
    shared = spark.createDataFrame(ROWS, LOGS_SCHEMA)
    reqs = {
        "c1": _req(addrs=["0xaaa"], topics=["0xT1"]),
        "c2": _req(addrs=["0xccc"]),
    }
    outs = multiplex(shared, reqs)
    from web3_flight_rpc_server_spark.plans.requests import logs_row_filter

    for name, req in reqs.items():
        direct = {r.blockNumber for r in shared.where(logs_row_filter(req)).collect()}
        via_union = {r.blockNumber for r in outs[name].collect()}
        assert direct == via_union, name
