"""Shared-ingest multiplexing (A7: filter-union across clients).

The reference holds ONE upstream WebSocket subscription whose filter
is the UNION of all clients' address/topic sets — degrading to a
wildcard if any client is unfiltered (LogsService.java:353-389:
``anyMatch(req -> req.getContractAddresses() == null || isEmpty())``)
— and then re-filters exactly per client (LogSubscription.java:36-49).

In Spark each client query owns its plan, so the exact per-client leg
is just ``logs_row_filter``; the coarse union remains useful for a
pushdown-capable source (an RPC DataSourceV2 or a broker
subscription), where it bounds what the shared ingest pulls. Both
legs live here so the architecture — upstream coarse, per-client
exact — is preserved and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.requests import ClientRequest, logs_row_filter


def union_upstream_filter(requests: list[ClientRequest]) -> dict | None:
    """The coarse upstream filter: union of all clients' sets, or None
    (wildcard) when any client is unfiltered on EITHER dimension —
    matching the reference's per-dimension anyMatch semantics
    (LogsService.java:354-360: addresses and topics degrade
    independently)."""
    if not requests:
        return None
    addresses: set[str] | None = set()
    topics: set[str] | None = set()
    for r in requests:
        if addresses is not None:
            if not r.contract_addresses:
                addresses = None  # wildcard
            else:
                addresses.update(a.lower() for a in r.contract_addresses)
        if topics is not None:
            if not r.topics:
                topics = None  # wildcard
            else:
                topics.update(r.topics)
    if addresses is None and topics is None:
        return None
    out: dict = {}
    if addresses is not None:
        out["contractAddresses"] = sorted(addresses)
    if topics is not None:
        out["topics"] = sorted(topics)
    return out


def coarse_filter_column(upstream: dict | None) -> Column:
    """The union filter as a Column (what a pushdown-capable shared
    source would apply). Reproduces the reference's coarse semantics
    including the topic0-only + empty-topics-pass quirk."""
    if upstream is None:
        return F.lit(True)
    pred = F.lit(True)
    if "contractAddresses" in upstream:
        pred = pred & F.lower(F.col("address")).isin(upstream["contractAddresses"])
    if "topics" in upstream:
        topic0 = F.try_element_at("topics", F.lit(1))
        empty = F.coalesce(F.size("topics") == 0, F.lit(True))
        pred = pred & (empty | topic0.isin(upstream["topics"]))
    return pred


def multiplex(shared: DataFrame,
              requests: dict[str, ClientRequest]) -> dict[str, DataFrame]:
    """One shared (streaming or batch) logs DataFrame -> one exactly
    filtered DataFrame per client. The shared leg gets the coarse
    union filter so a pushdown-capable source prunes upstream; each
    client leg re-filters exactly (upstream coarse, per-client
    exact — the reference's architecture)."""
    upstream = union_upstream_filter(list(requests.values()))
    coarse = shared.where(coarse_filter_column(upstream))
    return {
        name: coarse.where(logs_row_filter(req))
        for name, req in requests.items()
    }
