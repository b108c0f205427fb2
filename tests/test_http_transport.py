"""HTTP JSON-RPC transport coverage without a network (VERDICT r4 #3).

Every prior test drove the mock transport; the real parser —
`make_http_transport`'s JSON-RPC encoding, response decoding, and
classification of provider errors into TransportOverflow /
TransportConnectionError (what actually triggers A13 bisection and
A18 retry against Infura-class nodes, LogsService.java:578-606,
646-662) — had zero coverage. These tests stub
``urllib.request.urlopen`` with a canned provider and run the SAME
reader paths the mock tests cover, through the real wire format.

Driver-side direct reader invocation (no Spark executors): the
DataSource reader pickles to workers by value, so a driver-process
stub can't reach a worker — but `read()` is plain Python, and the
bisection/retry logic under test is identical either way.
"""

from __future__ import annotations

import io
import json

import pytest

from web3_flight_rpc_server_spark.sources.ethereum_rpc import (
    OVERFLOW_MARKERS,
    BlockRangePartition,
    EthereumLogsReader,
    TransportConnectionError,
    make_http_transport,
)


class FakeProvider:
    """Stands in for urllib.request.urlopen: decodes each eth_getLogs
    request, records it, and answers from a deterministic chain of
    ``logs_per_block`` logs per block — the same shape the mock
    transport emits, but serialized as a provider would (hex
    quantities, JSON-RPC envelope)."""

    def __init__(self, logs_per_block: int = 2,
                 overflow_limit: int | None = None,
                 fail_calls: tuple[int, ...] = (),
                 error_message: str | None = None,
                 mangle_hex: bool = False):
        self.logs_per_block = logs_per_block
        self.overflow_limit = overflow_limit
        self.fail_calls = fail_calls
        self.error_message = error_message
        self.mangle_hex = mangle_hex
        self.requests: list[dict] = []
        self.n_calls = 0

    def __call__(self, req, timeout=None):
        self.n_calls += 1
        body = json.loads(req.data)
        assert body["method"] == "eth_getLogs"
        params = body["params"][0]
        self.requests.append(params)
        if self.n_calls in self.fail_calls:
            raise ConnectionResetError("connection reset by peer")
        if self.error_message is not None:
            payload = {"jsonrpc": "2.0", "id": 1,
                       "error": {"code": -32005,
                                 "message": self.error_message}}
            return self._resp(payload)
        frm = int(params["fromBlock"], 16)
        to = int(params["toBlock"], 16)
        n_rows = (to - frm + 1) * self.logs_per_block
        if self.overflow_limit is not None and n_rows > self.overflow_limit:
            return self._resp(
                {"jsonrpc": "2.0", "id": 1,
                 "error": {"code": -32005, "message": OVERFLOW_MARKERS[0]}}
            )
        result = []
        for block in range(frm, to + 1):
            for i in range(self.logs_per_block):
                seq = block * self.logs_per_block + i
                result.append({
                    "address": f"0xa{block % 7}",
                    "data": "0x" + format(seq, "064x"),
                    "topics": ["0xT0", "0x" + format(seq, "064x")],
                    "blockNumber": "zz-not-hex" if self.mangle_hex
                    else hex(block),
                    "transactionHash": f"0xtx{seq:08d}",
                    "transactionIndex": hex(i),
                    "blockHash": f"0xblk{block:08d}",
                    "logIndex": hex(i),
                    "removed": False,
                })
        return self._resp({"jsonrpc": "2.0", "id": 1, "result": result})

    @staticmethod
    def _resp(payload: dict):
        class _Resp(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        return _Resp(json.dumps(payload).encode())


def _reader(**opts) -> EthereumLogsReader:
    base = {"transport": "http", "rpcurl": "http://node.invalid:8545"}
    base.update({k.lower(): str(v) for k, v in opts.items()})
    return EthereumLogsReader(base)


def _read_all(reader: EthereumLogsReader):
    rows = []
    for part in reader.partitions():
        rows.extend(reader.read(part))
    return rows


def test_success_page_decodes_hex_quantities(monkeypatch):
    fake = FakeProvider()
    monkeypatch.setattr("urllib.request.urlopen", fake)
    rows = _read_all(_reader(startblock=3, endblock=4))
    # 2 blocks x 2 logs, hex quantities decoded to ints by the parser
    assert len(rows) == 4
    blocks = sorted({r[3] for r in rows})
    assert blocks == [3, 4]
    assert all(isinstance(r[5], int) and isinstance(r[7], int) for r in rows)
    # request encoding: hex block cursors
    assert fake.requests[0]["fromBlock"] == "0x3"
    assert fake.requests[0]["toBlock"] == "0x4"


def test_filters_ride_in_the_request(monkeypatch):
    """A6 pushdown through the wire format: address list verbatim,
    topics nested in slot 0 (the A8 topic-position semantics)."""
    fake = FakeProvider()
    monkeypatch.setattr("urllib.request.urlopen", fake)
    _read_all(_reader(startblock=0, endblock=0,
                      contractaddresses="0xAAA,0xBBB", topics="0xT0"))
    p = fake.requests[0]
    assert p["address"] == ["0xaaa", "0xbbb"]
    assert p["topics"] == [["0xT0"]]


def test_overflow_error_triggers_bisection(monkeypatch):
    """A13 through the real error classifier: the provider's
    'query returned more than 10000 results' message must come back
    as TransportOverflow and drive the same bisection the mock path
    does — all logs exactly once, ranges split until they fit."""
    fake = FakeProvider(logs_per_block=2, overflow_limit=4)
    monkeypatch.setattr("urllib.request.urlopen", fake)
    rows = _read_all(_reader(startblock=0, endblock=7))
    assert len(rows) == 16  # 8 blocks x 2 logs, nothing lost or doubled
    assert sorted({r[3] for r in rows}) == list(range(8))
    served = [
        (int(p["fromBlock"], 16), int(p["toBlock"], 16))
        for p in fake.requests
    ]
    # first request is the full page; the rest are its bisections,
    # each final (served) range within the 2-block overflow budget
    assert served[0] == (0, 7)
    final = [r for r in served if (r[1] - r[0] + 1) * 2 <= 4]
    assert sorted(final) == [(0, 1), (2, 3), (4, 5), (6, 7)]


def test_irreducible_overflowing_block_is_skipped(monkeypatch):
    """LogsService.java:616-644 bisectOrSkip: a single block that
    still overflows is skipped, not retried forever."""
    fake = FakeProvider(logs_per_block=5, overflow_limit=4)
    monkeypatch.setattr("urllib.request.urlopen", fake)
    rows = _read_all(_reader(startblock=0, endblock=1))
    assert rows == []
    served = [
        (int(p["fromBlock"], 16), int(p["toBlock"], 16))
        for p in fake.requests
    ]
    assert (0, 0) in served and (1, 1) in served  # bisected to singles


def test_connection_reset_retried_once(monkeypatch):
    """A18: one recreate-and-retry on a connection-level failure — the
    OSError from urlopen must classify as TransportConnectionError and
    the second attempt serves the page."""
    fake = FakeProvider(fail_calls=(1,))
    monkeypatch.setattr("urllib.request.urlopen", fake)
    rows = _read_all(_reader(startblock=0, endblock=0))
    assert len(rows) == 2
    assert fake.n_calls == 2


def test_connection_reset_budget_exhausted_raises(monkeypatch):
    fake = FakeProvider(fail_calls=(1, 2))
    monkeypatch.setattr("urllib.request.urlopen", fake)
    with pytest.raises(TransportConnectionError):
        _read_all(_reader(startblock=0, endblock=0))
    assert fake.n_calls == 2  # attempts=2, then surface to task retry


def test_non_overflow_rpc_error_is_not_swallowed(monkeypatch):
    """A provider error that is NOT an overflow marker must surface as
    a hard error — classifying it as overflow would silently bisect
    and re-ask forever; classifying it as retryable would hammer a
    node that already answered."""
    fake = FakeProvider(error_message="invalid project id")
    monkeypatch.setattr("urllib.request.urlopen", fake)
    with pytest.raises(RuntimeError, match="rpc error: invalid project id"):
        _read_all(_reader(startblock=0, endblock=0))
    assert fake.n_calls == 1


def test_malformed_hex_surfaces_as_value_error(monkeypatch):
    """A provider emitting non-hex quantities is corrupt input, not a
    retryable condition: the decode error surfaces (pinned so a future
    'helpful' catch-all can't silently null the column)."""
    fake = FakeProvider(mangle_hex=True)
    monkeypatch.setattr("urllib.request.urlopen", fake)
    fetch = make_http_transport("http://node.invalid:8545")
    with pytest.raises(ValueError):
        fetch(0, 0, [], [])
