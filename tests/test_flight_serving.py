"""Wire-protocol parity tests: the reference notebook's client flow
(flight connect -> do_get(JSON ticket) -> read_all -> pandas) against
the engine's Flight server (notebook cells 5/16; Producer.java:38-69)."""

from __future__ import annotations

import json

import pyarrow.flight as flight
import pytest

from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA
from web3_flight_rpc_server_spark.serving import EngineFlightServer

LOG_ROWS = [
    ("0xAAA", "0x", ["0xT1", "0xE1"], 10, "h1", 0, "b1", 0, False),
    ("0xbbb", "0x", ["0xT2"], 20, "h2", 1, "b2", 1, False),
    ("0xccc", "0x", [], 30, "h3", 2, "b3", 2, False),
    ("0xAAA", "0x", ["0xT3"], 40, "h4", 3, "b4", 3, True),
]


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    logs = spark.createDataFrame(LOG_ROWS, LOGS_SCHEMA)
    blocks = spark.createDataFrame([(n,) for n in range(5, 10)], "number long")
    srv = EngineFlightServer("grpc://0.0.0.0:0", spark, logs=logs,
                             blocks=blocks, sf_dir=sf_dir)
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def client(server):
    return flight.FlightClient(f"grpc://localhost:{server.port}")


def _get(client, ticket_obj):
    reader = client.do_get(flight.Ticket(json.dumps(ticket_obj).encode()))
    return reader.read_all().to_pandas()


def test_bounded_logs_ticket(client):
    # the notebook's flow: {"dataset":"logs","startBlock":..,"endBlock":..}
    df = _get(client, {"dataset": "logs", "startBlock": 10, "endBlock": 30})
    assert sorted(df["blockNumber"]) == [10, 20, 30]
    assert list(df.columns) == [f.name for f in LOGS_SCHEMA.fields]


def test_ticket_filters_apply(client):
    df = _get(
        client,
        {"dataset": "logs", "startBlock": 0, "endBlock": 100,
         "contractAddresses": ["0xaaa"]},
    )
    assert sorted(df["blockNumber"]) == [10, 40]  # case-insensitive match
    df2 = _get(
        client,
        {"dataset": "logs", "startBlock": 0, "endBlock": 100,
         "topics": ["0xT1"]},
    )
    # topic0 match + empty-topics escape hatch (LogSubscription quirk)
    assert sorted(df2["blockNumber"]) == [10, 30]


def test_blocks_ticket_and_degenerate_mode(client):
    df = _get(client, {"dataset": "blocks", "startBlock": 6, "endBlock": 8})
    assert sorted(df["number"]) == [6, 7, 8]
    # degenerate blocks mode: start := end (BlocksService.java:106)
    df2 = _get(client, {"dataset": "blocks", "endBlock": 7})
    assert sorted(df2["number"]) == [7]


def test_unbounded_ticket_fails_fast(client):
    # the engine's ValueError crosses gRPC as an ArrowInvalid whose
    # message preserves the reason
    with pytest.raises(Exception, match="unbounded"):
        _get(client, {"dataset": "logs", "startBlock": 5})


def test_declared_query_over_flight(client):
    df = _get(client, {"dataset": "query", "name": "q_value_counts"})
    assert set(df.columns) == {"event_type", "n", "n_high"}
    assert df["n"].sum() > 0


def test_get_flight_info_echoes_command(client):
    cmd = json.dumps({"dataset": "logs"}).encode()
    info = client.get_flight_info(flight.FlightDescriptor.for_command(cmd))
    # Producer.java:66-69: one endpoint, echoed ticket, unknown stats
    # (unbounded ticket -> no sharding)
    assert len(info.endpoints) == 1
    assert info.endpoints[0].ticket.ticket == cmd
    assert info.total_records == -1
    assert info.total_bytes == -1


def test_bounded_scan_shards_into_multiple_endpoints(client):
    """Large bounded scans are served through >1 endpoint, each a
    narrowed sub-range ticket, so no single do_get materializes the
    full result on the driver; the shard union equals the unsharded
    read and shard ranges are disjoint."""
    cmd = {"dataset": "logs", "startBlock": 0, "endBlock": 100,
           "shardBlocks": 30}
    info = client.get_flight_info(
        flight.FlightDescriptor.for_command(json.dumps(cmd).encode())
    )
    assert len(info.endpoints) == 4  # ceil(101/30)
    assert info.total_records == -1 and info.total_bytes == -1
    ranges = []
    frames = []
    for ep in info.endpoints:
        t = json.loads(ep.ticket.ticket)
        assert t["dataset"] == "logs" and "shardBlocks" not in t
        ranges.append((t["startBlock"], t["endBlock"]))
        frames.append(client.do_get(ep.ticket).read_all().to_pandas())
    # contiguous, disjoint, covering [0, 100]
    ranges.sort()
    assert ranges[0][0] == 0 and ranges[-1][1] == 100
    assert all(ranges[i][1] + 1 == ranges[i + 1][0] for i in range(3))
    import pandas as pd

    sharded = pd.concat(frames, ignore_index=True)
    full = _get(client, {"dataset": "logs", "startBlock": 0, "endBlock": 100})
    key = ["blockNumber", "logIndex"]
    assert (
        sharded.sort_values(key).reset_index(drop=True)[key].values.tolist()
        == full.sort_values(key).reset_index(drop=True)[key].values.tolist()
    )


def test_concurrent_tickets_share_the_scheduler(client, server, spark):
    """Parallel do_get requests are served concurrently and correctly:
    each handler thread tags its jobs with a private FAIR pool, so one
    client's scan doesn't head-of-line-block another's (the reference
    runs one virtual thread per subscription). Correctness under
    concurrency is the assertion; fairness itself is a scheduler
    property we only smoke here via the FAIR-mode conf."""
    from concurrent.futures import ThreadPoolExecutor

    tickets = [
        {"dataset": "logs", "startBlock": 10, "endBlock": 30},
        {"dataset": "logs", "startBlock": 20, "endBlock": 40},
        {"dataset": "blocks", "startBlock": 5, "endBlock": 9},
        {"dataset": "logs", "startBlock": 0, "endBlock": 100},
    ]
    with ThreadPoolExecutor(max_workers=len(tickets)) as pool:
        frames = list(pool.map(lambda t: _get(client, t), tickets))
    assert [len(f) for f in frames] == [3, 3, 5, 4]
    # the engine session opts into FAIR scheduling (pool tags are
    # inert under FIFO, so this documents the intended deployment)
    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"


def test_handler_pool_tags_are_set_and_bounded(client, server, spark):
    """Handler threads tag their jobs with a per-THREAD pool name: the
    tag is observed from inside the handler (local properties are
    per-thread, so checking from the pytest thread would be vacuous),
    and repeated requests must REUSE names — a per-request name (the
    old uuid scheme) leaks one scheduler pool per ticket forever,
    because Spark never removes on-demand pools from rootPool."""
    seen = []
    orig = EngineFlightServer._do_get

    def probe(self, context, ticket):
        seen.append(
            spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        )
        return orig(self, context, ticket)

    EngineFlightServer._do_get = probe
    try:
        for _ in range(12):
            _get(client, {"dataset": "blocks", "startBlock": 5, "endBlock": 9})
    finally:
        EngineFlightServer._do_get = orig
    assert len(seen) == 12
    assert all(s and s.startswith("flight-") for s in seen)
    # bounded: strictly fewer distinct pool names than requests proves
    # names are keyed by handler thread, not minted per request
    assert len(set(seen)) < 12


def test_large_query_result_streams_in_bounded_batches(client, server, spark,
                                                       sf_dir, monkeypatch):
    """A scan-shaped query ticket above STREAM_THRESHOLD_ROWS must NOT
    be driver-materialized in one piece: it is spilled by the executors
    and served as multiple Arrow batches of at most SPILL_BATCH_ROWS.
    Thresholds are shrunk so the fixture-scale q_scan_project (~hundreds
    of rows at sf0.001) exercises the overflow path; content must match
    the direct query result exactly."""
    monkeypatch.setattr(EngineFlightServer, "STREAM_THRESHOLD_ROWS", 50)
    monkeypatch.setattr(EngineFlightServer, "SPILL_BATCH_ROWS", 64)
    reader = client.do_get(flight.Ticket(json.dumps(
        {"dataset": "query", "name": "q_scan_project"}
    ).encode()))
    batches = [chunk.data for chunk in reader]
    assert len(batches) > 1
    assert all(b.num_rows <= 64 for b in batches)
    import pyarrow as pa

    served = pa.Table.from_batches(batches).to_pandas()
    from web3_flight_rpc_server_spark.registry import all_queries

    direct = all_queries()["q_scan_project"].fn(spark, sf_dir).toPandas()
    assert len(served) == len(direct) > 50
    key = sorted(served.columns)
    assert (
        served.sort_values(key).reset_index(drop=True)[key].equals(
            direct.sort_values(key).reset_index(drop=True)[key]
        )
    )
