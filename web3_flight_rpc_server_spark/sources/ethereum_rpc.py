"""Live-source parity: an Ethereum-logs Spark DataSource (Python
DataSource API, Spark 4) reproducing the reference's source operators:

- A1  paged historical scan: one input partition per maxBlockRange
      page (LogsService.java:507-523; default 500,
      FlightRpcServer.java:60) — pages fetch IN PARALLEL across the
      cluster, where the reference pages serially per subscription
- A6  pushdown: address/topic filters ride into every RPC call
      (LogsService.java:548-556)
- A13 adaptive bisection: on an overflow error ("query returned more
      than 10000 results" / "response too big") the range splits in
      half recursively; single blocks that still overflow are skipped
      (LogsService.java:616-644 bisectOrSkip)
- A18 fault tolerance: one reconnect-and-retry on connection errors
      (LogsService.java:567-577,646-662); anything beyond that is
      Spark task retry (spark.task.maxFailures)

Transports are injected: ``mock`` (deterministic synthetic logs
mirroring the reference's test-data generator — alternating Transfer/
Approval events, test-data/generate-test-data.js:141-156) for tests
and offline use; ``http`` (stdlib urllib JSON-RPC) for a real node.
Transport state lives on the reader instance, which is pickled by
value to workers — no package import needed worker-side.

Usage:
    spark.dataSource.register(EthereumLogsDataSource)
    df = (spark.read.format("ethereum_logs")
          .option("startBlock", 0).option("endBlock", 999)
          .option("contractAddresses", "0xaaa,0xbbb")
          .option("topics", "0xT1")
          .option("transport", "mock")
          .load())
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import LOGS_SCHEMA

DEFAULT_MAX_BLOCK_RANGE = 500  # FlightRpcServer.java:60
OVERFLOW_MARKERS = (
    "query returned more than 10000 results",  # LogsService.java:597
    "response is too big",                     # LogsService.java:598
)


class TransportOverflow(Exception):
    """The node refused the range (too many results / too big)."""


class TransportConnectionError(Exception):
    """Connection-level failure (retryable once, A18)."""


@dataclass
class BlockRangePartition(InputPartition):
    start: int
    end: int


def make_mock_transport(logs_per_block: int = 2, overflow_limit: int | None = None,
                        fail_first_call: bool = False):
    """Deterministic synthetic transport. Emits ``logs_per_block`` logs
    per block with alternating Transfer/Approval topic0 (mirroring the
    reference generator); raises TransportOverflow when a request
    would return more than ``overflow_limit`` rows (to exercise A13)
    and optionally one connection error on the first call (A18).
    State is a mutable cell captured by the closure — safe because
    each worker gets its own deserialized copy."""
    transfer = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    approval = "0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925"
    state = {"calls": 0}

    def fetch(from_block: int, to_block: int, addresses: list[str],
              topics: list[str]) -> list[dict]:
        state["calls"] += 1
        if fail_first_call and state["calls"] == 1:
            raise TransportConnectionError("connection reset (simulated)")
        n_rows = (to_block - from_block + 1) * logs_per_block
        if overflow_limit is not None and n_rows > overflow_limit:
            raise TransportOverflow(OVERFLOW_MARKERS[0])
        out = []
        for block in range(from_block, to_block + 1):
            for i in range(logs_per_block):
                seq = block * logs_per_block + i
                address = f"0x{'a' if seq % 3 else 'b'}{block % 7}"
                topic0 = transfer if seq % 2 == 0 else approval
                if addresses and address.lower() not in addresses:
                    continue
                if topics and topic0 not in topics:
                    continue
                out.append(
                    {
                        "address": address,
                        "data": "0x" + format(seq, "064x"),
                        "topics": [topic0, "0x" + format(seq, "064x")],
                        "blockNumber": block,
                        "transactionHash": f"0xtx{seq:08d}",
                        "transactionIndex": i,
                        "blockHash": f"0xblk{block:08d}",
                        "logIndex": i,
                        "removed": False,
                    }
                )
        return out

    return fetch


def make_http_transport(rpc_url: str, timeout_s: float = 30.0):
    """stdlib JSON-RPC eth_getLogs transport for a real node."""
    import urllib.request

    def fetch(from_block: int, to_block: int, addresses: list[str],
              topics: list[str]) -> list[dict]:
        params: dict = {
            "fromBlock": hex(from_block),
            "toBlock": hex(to_block),
        }
        if addresses:
            params["address"] = addresses
        if topics:
            params["topics"] = [topics]  # slot-0 semantics, A8
        body = json.dumps(
            {"jsonrpc": "2.0", "id": 1, "method": "eth_getLogs",
             "params": [params]}
        ).encode()
        req = urllib.request.Request(
            rpc_url, data=body, headers={"Content-Type": "application/json"}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                payload = json.loads(resp.read())
        except OSError as e:
            raise TransportConnectionError(str(e)) from e
        if "error" in payload:
            msg = str(payload["error"].get("message", ""))
            if any(m in msg for m in OVERFLOW_MARKERS):
                raise TransportOverflow(msg)
            raise RuntimeError(f"rpc error: {msg}")
        rows = []
        for log in payload.get("result", []):
            rows.append(
                {
                    "address": log.get("address"),
                    "data": log.get("data"),
                    "topics": log.get("topics"),
                    "blockNumber": int(log["blockNumber"], 16)
                    if log.get("blockNumber") else None,
                    "transactionHash": log.get("transactionHash"),
                    "transactionIndex": int(log["transactionIndex"], 16)
                    if log.get("transactionIndex") else None,
                    "blockHash": log.get("blockHash"),
                    "logIndex": int(log["logIndex"], 16)
                    if log.get("logIndex") else None,
                    "removed": bool(log.get("removed", False)),
                }
            )
        return rows

    return fetch


class EthereumLogsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = int(options.get("startblock", 0))
        self.end = int(options.get("endblock", self.start))
        self.max_range = int(
            options.get("maxblockrange", DEFAULT_MAX_BLOCK_RANGE)
        )
        addrs = options.get("contractaddresses") or ""
        self.addresses = [a.strip().lower() for a in addrs.split(",") if a.strip()]
        topics = options.get("topics") or ""
        self.topics = [t.strip() for t in topics.split(",") if t.strip()]

        transport = options.get("transport", "mock")
        if transport == "mock":
            self.fetch = make_mock_transport(
                logs_per_block=int(options.get("mocklogsperblock", 2)),
                overflow_limit=(
                    int(options["mockoverflowlimit"])
                    if "mockoverflowlimit" in options else None
                ),
                fail_first_call=options.get("mockfailfirstcall") == "true",
            )
        elif transport == "http":
            self.fetch = make_http_transport(options["rpcurl"])
        else:
            raise ValueError(f"unknown transport: {transport!r}")

    def partitions(self):
        # A12: inclusive maxBlockRange pages (LogsService.java:509-521)
        pages = []
        first = self.start
        while first <= self.end:
            last = min(first + self.max_range - 1, self.end)
            pages.append(BlockRangePartition(first, last))
            first = last + 1
        return pages or [BlockRangePartition(self.start, self.end)]

    def read(self, partition: BlockRangePartition):
        yield from self._fetch_bisecting(partition.start, partition.end)

    # -- reference resilience semantics ---------------------------------
    def _fetch_bisecting(self, start: int, end: int):
        """A13 bisectOrSkip + A18 single retry, per range."""
        try:
            rows = self._fetch_with_retry(start, end)
        except TransportOverflow:
            if start >= end:
                return  # irreducible single block: skip (LogsService.java:620)
            mid = (start + end) // 2
            yield from self._fetch_bisecting(start, mid)
            yield from self._fetch_bisecting(mid + 1, end)
            return
        for log in rows:
            yield (
                log["address"], log["data"], log["topics"],
                log["blockNumber"], log["transactionHash"],
                log["transactionIndex"], log["blockHash"],
                log["logIndex"], log["removed"],
            )

    def _fetch_with_retry(self, start: int, end: int):
        try:
            return self.fetch(start, end, self.addresses, self.topics)
        except TransportConnectionError:
            # recreate-and-retry once (LogsService.java:567-577)
            return self.fetch(start, end, self.addresses, self.topics)


class EthereumLogsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ethereum_logs"

    def schema(self):
        return LOGS_SCHEMA

    def reader(self, schema) -> EthereumLogsReader:
        return EthereumLogsReader(self.options)
