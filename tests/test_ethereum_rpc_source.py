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


def test_stream_batch_parity(registered, spark, tmp_path):
    """A3: streaming the live source yields exactly the rows the
    bounded read yields over the same range (the ordering contract of
    SubscriptionTest.java:124-145, minus ordering — Spark's exchange
    may interleave pages; per-key order is the blockNumber column)."""
    bounded = _read(
        spark, startBlock=0, endBlock=57, transport="mock",
        maxBlockRange=10,
    ).collect()

    stream = (
        spark.readStream.format("ethereum_logs")
        .option("startBlock", 0)
        .option("mockLatestBlock", 57)
        .option("transport", "mock")
        .option("maxBlockRange", 10)
        .option("maxBlocksPerBatch", 25)  # force >=3 micro-batches
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("rpc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM rpc_stream").collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, bounded))


def test_stream_resume_from_checkpoint_catches_up(registered, spark, tmp_path):
    """A19's replacement, demonstrated: stop the stream, advance the
    chain head, restart from the same checkpoint — the query resumes
    at the committed offset and reads only the new blocks (no replay,
    no gap)."""
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out")

    def run(latest: int):
        stream = (
            spark.readStream.format("ethereum_logs")
            .option("startBlock", 0)
            .option("mockLatestBlock", latest)
            .option("transport", "mock")
            .option("maxBlockRange", 10)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(latest=19)   # first life of the query: blocks 0..19
    run(latest=39)   # "chain advanced" while the query was down
    rows = spark.read.parquet(out).select("blockNumber").collect()
    got = sorted(r.blockNumber for r in rows)
    assert got == sorted(
        b for b in range(0, 40) for _ in range(2)
    )  # 2 logs/block, each block exactly once across both lives


def test_blocks_stream_batch_parity(spark, tmp_path):
    """A4: streaming the blocks source yields the same rows as the
    bounded point-lookup read over the same range."""
    from web3_flight_rpc_server_spark.sources.ethereum_rpc import (
        EthereumBlocksDataSource,
    )

    spark.dataSource.register(EthereumBlocksDataSource)
    bounded = (
        spark.read.format("ethereum_blocks")
        .option("startBlock", 0).option("endBlock", 23)
        .option("transport", "mock").option("maxBlockRange", 5)
        .load()
        .collect()
    )
    stream = (
        spark.readStream.format("ethereum_blocks")
        .option("startBlock", 0)
        .option("mockLatestBlock", 23)
        .option("transport", "mock")
        .option("maxBlockRange", 5)
        .option("maxBlocksPerBatch", 10)
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("blocks_stream")
        .option("checkpointLocation", str(tmp_path / "bckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM blocks_stream").collect()
    assert sorted(r.number for r in streamed) == sorted(
        r.number for r in bounded
    ) == list(range(24))


def test_blocks_point_lookup_read(spark):
    from web3_flight_rpc_server_spark.sources.ethereum_rpc import (
        EthereumBlocksDataSource,
    )

    spark.dataSource.register(EthereumBlocksDataSource)
    df = (
        spark.read.format("ethereum_blocks")
        .option("startBlock", 10).option("endBlock", 29)
        .option("transport", "mock").option("maxBlockRange", 7)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 20
    byn = {r.number: r for r in rows}
    assert byn[10].gasUsed == (10 * 1_337) % 30_000_000  # hex decoded
    assert byn[10].gasLimit == 30_000_000
    assert byn[10].nonce == "0x" + format(10, "016x")  # raw hex kept
    assert byn[11].parentHash == byn[10].hash
    assert len(byn[12].transactions) == 2


def test_hybrid_plan_over_live_source(registered, spark, tmp_path):
    """A14 over the LIVE source (not file drops): backfill leg reads
    the bounded DataSource, the tail leg streams the SAME source above
    the high-water mark — backfill [10, 30], then live (30, 50]."""
    from web3_flight_rpc_server_spark.plans.requests import ClientRequest
    from web3_flight_rpc_server_spark.streaming.backfill import (
        plan_hybrid,
        run_hybrid,
    )

    batch = (
        spark.read.format("ethereum_logs")
        .option("startBlock", 0).option("endBlock", 30)
        .option("transport", "mock").load()
    )
    stream = (
        spark.readStream.format("ethereum_logs")
        .option("startBlock", 0)
        .option("mockLatestBlock", 50)
        .option("transport", "mock").load()
    )
    req = ClientRequest(dataset="logs", start_block=10)  # HYBRID mode
    plan = plan_hybrid(req, batch, stream)
    assert plan.high_water == 30

    legs: list[tuple[int, list[int]]] = []

    def sink(df, epoch):
        legs.append((epoch, sorted(r.blockNumber for r in df.collect())))

    q = run_hybrid(plan, sink, str(tmp_path / "hckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    backfill = [blocks for epoch, blocks in legs if epoch == -1]
    tail = sorted(b for epoch, blocks in legs if epoch >= 0 for b in blocks)
    assert backfill and backfill[0] == sorted(
        b for b in range(10, 31) for _ in range(2)
    )
    assert tail == sorted(b for b in range(31, 51) for _ in range(2))


def test_stream_survives_midstream_transport_outage(registered, spark, tmp_path):
    """A19: the transport dies for a window of calls MID-STREAM; the
    in-stream backoff retry (reference reconnect envelope,
    LogsService.java:306-351) must heal it in-process — the query
    finishes without restart and the result has no gap and no replay
    vs the bounded read. Fetch calls 2-4 fail: with maxBlockRange=20
    over 58 blocks the first page succeeds, then the outage spans
    page boundaries and multiple retries."""
    bounded = _read(
        spark, startBlock=0, endBlock=57, transport="mock",
        maxBlockRange=20,
    ).collect()

    stream = (
        spark.readStream.format("ethereum_logs")
        .option("startBlock", 0)
        .option("mockLatestBlock", 57)
        .option("transport", "mock")
        .option("maxBlockRange", 20)
        .option("mockFailCalls", "2:4")     # per-task call window
        .option("retryAttempts", 6)
        .option("retryInitialDelayMs", 10)  # keep the test fast
        .option("retryMaxDelayMs", 40)
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("heal_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM heal_stream").collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, bounded))


def test_stream_survives_head_probe_outage(registered, spark, tmp_path):
    """A19, driver side: latestOffset's head probe fails for a window
    of calls; the same backoff envelope retries it in-process so the
    stream keeps planning micro-batches."""
    stream = (
        spark.readStream.format("ethereum_logs")
        .option("startBlock", 0)
        .option("mockLatestBlock", 19)
        .option("transport", "mock")
        .option("maxBlockRange", 10)
        .option("mockProbeFailCalls", "1:2")
        .option("retryAttempts", 4)
        .option("retryInitialDelayMs", 10)
        .option("retryMaxDelayMs", 40)
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("probe_heal")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    assert spark.sql("SELECT count(*) AS n FROM probe_heal").first().n == 40


def test_stream_outage_beyond_budget_fails_to_checkpoint_restart(
        registered, spark, tmp_path):
    """An outage longer than the retry budget must SURFACE (the
    documented fallback is checkpoint-restart), not hang or silently
    drop the range — and a restart against the same checkpoint after
    the transport recovers completes with no gap and no replay."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "rows")

    def start_stream(fail_spec: str | None):
        reader = (
            spark.readStream.format("ethereum_logs")
            .option("startBlock", 0)
            .option("mockLatestBlock", 39)
            .option("transport", "mock")
            .option("maxBlockRange", 10)
            .option("retryAttempts", 2)
            .option("retryInitialDelayMs", 5)
            .option("retryMaxDelayMs", 10)
        )
        if fail_spec:
            reader = reader.option("mockFailCalls", fail_spec)
        return (
            reader.load().writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start_stream("1:99")  # dead transport, budget of 2 can't heal
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()

    q2 = start_stream(None)  # transport recovered; resume from ckpt
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()
    rows = spark.read.parquet(out).collect()
    bounded = _read(
        spark, startBlock=0, endBlock=39, transport="mock", maxBlockRange=10,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, bounded))


def test_poll_interval_bounds_arrival_latency(registered, spark, tmp_path):
    """Latency envelope of the polling realtime path: arrival lag is
    bounded by pollIntervalMs + batch execution, so against a chain
    whose head advances continuously, a short poll interval delivers
    strictly more (smaller, fresher) micro-batches in the same wall
    window than a long one. Known backlog drains at full speed either
    way (the head is cached between probes) — the interval only rate-
    limits node probes, mirroring ~12 s block cadence economics."""
    import time

    def run_window(poll_ms: int, name: str) -> int:
        q = (
            spark.readStream.format("ethereum_logs")
            .option("startBlock", 0)
            .option("mockLatestBlock", 3)
            .option("mockHeadAdvanceMs", 100)  # +1 block / 100 ms
            .option("transport", "mock")
            .option("pollIntervalMs", poll_ms)
            .load()
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .start()
        )
        try:
            time.sleep(3.0)
        finally:
            q.stop()
        return sum(
            1 for p in q.recentProgress if p["numInputRows"] > 0
        )

    slow = run_window(1400, "lag_slow")
    fast = run_window(60, "lag_fast")
    # slow: at most ceil(3s/1.4s)+1 = 4 data batches; fast: bounded
    # only by execution time, reliably more under the same load
    assert slow <= 4
    assert fast > slow
