"""Client-request model: JSON ticket -> DataFrame plan.

The reference's entire "query language" is one JSON ticket
(reference server/src/main/java/net/broscorp/web3/dto/request/
ClientRequest.java:16-36, LogsRequest.java:24-27,
BlocksRequest.java:14-15; parsed in Producer.java:38-64):

    {"dataset": "logs"|"blocks", "startBlock": n|null,
     "endBlock": n|null, "contractAddresses": [..], "topics": [..]}

Mode selection falls out of null-ness (ClientRequest.java:30-36):
needsHistoricalData <=> startBlock != null; awaitingForRealTimeData
<=> endBlock == null. This module reproduces the request semantics on
a DataFrame: the bounded surface becomes a filtered scan; the
unbounded surface delegates to streaming/ (the hybrid seam is the
backfill module there).

Filter semantics replicated EXACTLY (the two quirks included):

- address IN-list is case-insensitive
  (LogSubscription.java:43-45: equalsIgnoreCase)
- topics filter tests ONLY topics[0], and rows with an EMPTY topics
  array pass regardless (LogSubscription.java:40-42:
  log.getTopics().isEmpty() || request.getTopics().contains(topics[0]))
- null/missing topics column: the Java stream would NPE on a null
  list; fixtures never produce null topics — we treat null like empty
  (passes), documented deviation
- blocks are never filtered beyond the range
  (BlockSubscription.java:36-38 identity filter)

Scale notes: every predicate built here is a deterministic column
predicate -> Catalyst pushes it to the source scan (parquet row-group
pruning; a DataSourceV2 RPC reader would receive them via
SupportsPushDownFilters). The range maps to partition pruning when the
table is written partitioned by block bucket.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RequestMode(Enum):
    """The four modes of ClientRequest.java:30-36 (SURVEY.md §1.3)."""

    BOUNDED = "bounded"            # [start, end] then close
    HYBRID = "hybrid"              # backfill [start, latest] then stream
    REALTIME = "realtime"          # stream from latest only
    DEGENERATE = "degenerate"      # start=null, end!=null: see below


@dataclass(frozen=True)
class ClientRequest:
    """Parsed ticket (ClientRequest/LogsRequest/BlocksRequest DTOs)."""

    dataset: str                                  # "logs" | "blocks"
    start_block: int | None = None
    end_block: int | None = None
    contract_addresses: list[str] | None = None   # logs only
    topics: list[str] | None = None               # logs only

    @staticmethod
    def from_json(ticket: bytes | str) -> "ClientRequest":
        """Parse the Flight ticket JSON (Producer.java:40-51). Block
        cursors may arrive as JSON numbers or strings
        (Producer.java:74-79 accepts both)."""
        obj = json.loads(ticket)
        dataset = obj.get("dataset")
        if dataset not in ("logs", "blocks"):
            raise ValueError(f"unknown dataset: {dataset!r}")

        def _cursor(v):
            if v is None:
                return None
            return int(v)  # accepts int or decimal-string, like BigInteger

        return ClientRequest(
            dataset=dataset,
            start_block=_cursor(obj.get("startBlock")),
            end_block=_cursor(obj.get("endBlock")),
            contract_addresses=obj.get("contractAddresses"),
            topics=obj.get("topics"),
        )

    @property
    def mode(self) -> RequestMode:
        if self.start_block is not None and self.end_block is not None:
            return RequestMode.BOUNDED
        if self.start_block is not None:
            return RequestMode.HYBRID
        if self.end_block is None:
            return RequestMode.REALTIME
        return RequestMode.DEGENERATE


def logs_row_filter(request: ClientRequest) -> F.Column:
    """The per-row predicate of LogSubscription.filter
    (LogSubscription.java:36-49), as one boolean Column.

    Quirk preservation (LogsServiceTest-verified behaviors):
    - topics: only element 1 (topics[0] in Java) is tested; empty (or
      null) topics array passes the filter regardless
    - addresses: case-insensitive membership

    The filters activate whenever the request list is NON-NULL (the
    Java DTO default), so an explicitly empty list is NOT a wildcard:
    addresses=[] rejects every row (contains() on an empty list), and
    topics=[] rejects every row with a non-empty topics array while
    still passing empty-topics rows (the quirk short-circuits first).
    """
    pred = F.lit(True)
    if request.contract_addresses is not None:
        lowered = [a.lower() for a in request.contract_addresses]
        pred = pred & F.lower(F.col("address")).isin(lowered)
    if request.topics is not None:
        topic0 = F.try_element_at("topics", F.lit(1))
        empty = F.coalesce(F.size("topics") == 0, F.lit(True))
        pred = pred & (empty | topic0.isin(request.topics))
    return pred


def block_range_filter(request: ClientRequest, block_col: str) -> F.Column:
    """Inclusive [startBlock, endBlock] range (LogsService.java:505-527;
    BlocksService.java:94-129). For the DEGENERATE blocks mode the
    reference defaults start := end (BlocksService.java:106) — one
    block; for logs it sends nothing (LogsService.java:505) — the
    caller handles that asymmetry (see plan_request)."""
    pred = F.lit(True)
    if request.start_block is not None:
        pred = pred & (F.col(block_col) >= request.start_block)
    if request.end_block is not None:
        pred = pred & (F.col(block_col) <= request.end_block)
    return pred


def plan_request(request: ClientRequest, logs: DataFrame | None = None,
                 blocks: DataFrame | None = None) -> DataFrame:
    """Bounded-surface planner: ticket -> filtered DataFrame over the
    canonical logs/blocks tables (schemas.py). Streaming modes raise —
    they are served by streaming/backfill.py, mirroring how the
    reference routes realtime work to the subscription machinery."""
    if request.mode in (RequestMode.HYBRID, RequestMode.REALTIME):
        raise ValueError(
            f"{request.mode.value} requests are unbounded — serve via "
            "streaming/backfill.plan_hybrid"
        )
    if request.dataset == "logs":
        if logs is None:
            raise ValueError("logs DataFrame required")
        if request.mode is RequestMode.DEGENERATE:
            # start=null => canFetchHistoricalData false: the reference
            # sends no historical data and (endBlock!=null) closes —
            # an empty result (LogsService.java:505-527).
            return logs.where(F.lit(False))
        return logs.where(
            block_range_filter(request, "blockNumber")
            & logs_row_filter(request)
        )
    if blocks is None:
        raise ValueError("blocks DataFrame required")
    req = request
    if request.mode is RequestMode.DEGENERATE:
        # blocks asymmetry: start defaults to end (BlocksService.java:106)
        req = ClientRequest(
            dataset=request.dataset,
            start_block=request.end_block,
            end_block=request.end_block,
        )
    # blocks are never row-filtered (BlockSubscription.java:36-38)
    return blocks.where(block_range_filter(req, "number"))
