"""Streaming-surface tests.

Micro-batches are driven synchronously: each parquet file dropped into
the source directory is one push event (maxFilesPerTrigger=1), and
processAllAvailable() runs the engine to quiescence. The hybrid
ordering test mirrors the reference's SubscriptionTest.java:124-145
([100,101] historical, then buffered [999], then live [1000])."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.plans import ClientRequest
from web3_flight_rpc_server_spark.schemas import LOGS_SCHEMA
from web3_flight_rpc_server_spark.streaming import (
    events_stream,
    latest_log_state,
    plan_hybrid,
    session_agg,
    tumbling_agg,
    watermarked_dedup,
)
from web3_flight_rpc_server_spark.streaming.sources import logs_stream

NS_HOUR = 3_600 * 10**9


def _write_events(spark, dir_path, rows):
    """rows: (event_id, ts_ns, user_id, event_type, value, props)"""
    (
        spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(dir_path)
    )


def _log_row(block, idx, addr="0xaaa", removed=False, data="0x"):
    return (addr, data, ["0xT1"], block, f"h{block}-{idx}", 0, f"b{block}", idx, removed)


def _write_logs(spark, dir_path, rows):
    spark.createDataFrame(rows, LOGS_SCHEMA).coalesce(1).write.mode("append").parquet(dir_path)


@pytest.fixture()
def workdir(tmp_path):
    return tmp_path


def test_tumbling_window_emits_on_watermark(spark, workdir):
    src = str(workdir / "src")
    # 4 clicks in [00:00,06:00), 2 in [06:00,12:00)
    _write_events(spark, src, [
        (1, 1 * NS_HOUR, 1, "click", 1.0, "{}"),
        (2, 2 * NS_HOUR, 1, "click", 2.0, "{}"),
        (3, 3 * NS_HOUR, 2, "click", 3.0, "{}"),
        (4, 5 * NS_HOUR, 2, "click", 4.0, "{}"),
        (5, 7 * NS_HOUR, 1, "click", 5.0, "{}"),
        (6, 8 * NS_HOUR, 1, "click", 6.0, "{}"),
    ])
    agg = tumbling_agg(events_stream(spark, src), width="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("tumbling_out")
        .option("checkpointLocation", str(workdir / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark past both windows (two pushes: one to
        # observe the new max event time, one to emit against it)
        _write_events(spark, src, [(7, 400 * NS_HOUR, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        _write_events(spark, src, [(8, 401 * NS_HOUR, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        got = {
            (r.win_start.hour, r.n, r.total_value)
            for r in spark.sql(
                "SELECT * FROM tumbling_out WHERE event_type = 'click'"
            ).collect()
        }
        assert got == {(0, 4, 10.0), (6, 2, 11.0)}
    finally:
        q.stop()


def test_session_window_gap_split(spark, workdir):
    src = str(workdir / "src")
    # user 1: events at 00:00 and 00:10 (one session), then 02:00 (new)
    m = 60 * 10**9
    _write_events(spark, src, [
        (1, 0 * m, 1, "click", 1.0, "{}"),
        (2, 10 * m, 1, "click", 1.0, "{}"),
        (3, 120 * m, 1, "click", 1.0, "{}"),
    ])
    agg = session_agg(events_stream(spark, src), gap="30 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("session_out")
        .option("checkpointLocation", str(workdir / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(spark, src, [(9, 5000 * m, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        _write_events(spark, src, [(10, 5001 * m, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        got = sorted(
            (r.n, r.session_start.minute + 60 * r.session_start.hour)
            for r in spark.sql(
                "SELECT * FROM session_out WHERE user_id = 1"
            ).collect()
        )
        assert got == [(1, 120), (2, 0)]
    finally:
        q.stop()


def test_late_rows_dropped_after_watermark(spark, workdir):
    """C16: an event older than the advanced watermark must NOT create
    or amend a window (the late-data policy the reference lacks)."""
    src = str(workdir / "src")
    _write_events(spark, src, [(1, 1 * NS_HOUR, 1, "click", 1.0, "{}")])
    agg = tumbling_agg(events_stream(spark, src), width="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("late_out")
        .option("checkpointLocation", str(workdir / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance watermark far past the first window...
        _write_events(spark, src, [(2, 300 * NS_HOUR, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        _write_events(spark, src, [(3, 301 * NS_HOUR, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        # ...then deliver a LATE click into the long-closed first window
        _write_events(spark, src, [(4, 2 * NS_HOUR, 1, "click", 99.0, "{}")])
        q.processAllAvailable()
        _write_events(spark, src, [(5, 302 * NS_HOUR, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        clicks = spark.sql(
            "SELECT * FROM late_out WHERE event_type = 'click'"
        ).collect()
        assert [(r.n, r.total_value) for r in clicks] == [(1, 1.0)], (
            "late row must be dropped, not re-open the window"
        )
    finally:
        q.stop()


def test_sliding_window_streaming(spark, workdir):
    """Overlapping windows in streaming mode: one event lands in
    width/slide = 3 windows."""
    from web3_flight_rpc_server_spark.streaming import sliding_agg

    src = str(workdir / "src")
    _write_events(spark, src, [(1, 7 * NS_HOUR, 1, "click", 1.0, "{}")])
    agg = sliding_agg(
        events_stream(spark, src), width="6 hours", slide="2 hours",
        watermark="1 hour",
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("slide_out")
        .option("checkpointLocation", str(workdir / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(spark, src, [(2, 300 * NS_HOUR, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        _write_events(spark, src, [(3, 301 * NS_HOUR, 9, "flush", 0.0, "{}")])
        q.processAllAvailable()
        starts = sorted(
            r.win_start.hour
            for r in spark.sql(
                "SELECT * FROM slide_out WHERE event_type = 'click'"
            ).collect()
        )
        assert starts == [2, 4, 6], "event at 07:00 -> windows starting 02/04/06"
    finally:
        q.stop()


def test_watermarked_dedup_drops_seam_duplicates(spark, workdir):
    src = str(workdir / "src")
    # the A14 seam scenario: block 999/idx 0 delivered twice
    _write_logs(spark, src, [_log_row(999, 0), _log_row(1000, 0)])
    _write_logs(spark, src, [_log_row(999, 0)])  # duplicate delivery
    stream = logs_stream(spark, src).withColumn(
        "event_ts", F.timestamp_seconds(F.col("blockNumber") * 12)
    )
    deduped = watermarked_dedup(
        stream, "event_ts", "10 minutes", ["blockNumber", "logIndex"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(workdir / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.blockNumber, r.logIndex)
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        )
        assert got == [(999, 0), (1000, 0)]
    finally:
        q.stop()


def test_hybrid_backfill_then_realtime_ordering(spark, workdir):
    """SubscriptionTest.java:124-145 ordering: historical [100,101]
    before buffered realtime [999] before live [1000]."""
    stream_dir = str(workdir / "rt")
    batch_logs = spark.createDataFrame(
        [_log_row(100, 0), _log_row(101, 0)], LOGS_SCHEMA
    )
    # realtime row that "arrived during backfill"
    _write_logs(spark, stream_dir, [_log_row(999, 0)])

    deliveries: list[tuple[int, list[int]]] = []

    def sink(df, epoch):
        blocks = sorted(r.blockNumber for r in df.collect())
        if blocks:
            deliveries.append((epoch, blocks))

    from web3_flight_rpc_server_spark.streaming import run_hybrid

    req = ClientRequest("logs", start_block=100, end_block=None)
    plan = plan_hybrid(req, batch_logs, logs_stream(spark, stream_dir))
    assert plan.high_water == 101
    q = run_hybrid(plan, sink, str(workdir / "ckpt"))
    try:
        _write_logs(spark, stream_dir, [_log_row(1000, 0)])  # live row
        q.processAllAvailable()
    finally:
        q.stop()
    assert deliveries[0] == (-1, [100, 101])
    tail_blocks = [b for _, bs in deliveries[1:] for b in bs]
    assert tail_blocks == [999, 1000]


def test_reorg_retraction_and_reinstate(spark, workdir):
    src = str(workdir / "src")
    _write_logs(spark, src, [_log_row(7, 0, addr="0xaaa")])
    q = (
        latest_log_state(logs_stream(spark, src))
        .writeStream.outputMode("update")
        .format("memory").queryName("reorg_out")
        .option("checkpointLocation", str(workdir / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_logs(spark, src, [_log_row(7, 0, addr="0xaaa", removed=True)])
        q.processAllAvailable()
        _write_logs(spark, src, [_log_row(7, 0, addr="0xbbb")])
        q.processAllAvailable()
        rows = sorted(
            spark.sql("SELECT * FROM reorg_out").collect(),
            key=lambda r: r.version,
        )
        states = [(r.version, r.is_removed, r.address) for r in rows]
        assert states == [
            (1, False, "0xaaa"),   # canonical
            (2, True, "0xaaa"),    # reorged out -> retraction
            (3, False, "0xbbb"),   # re-emitted on new canonical chain
        ]
    finally:
        q.stop()


def test_session_window_parity_with_batch_sessionize(spark):
    """The two sessionization formulations — streaming
    session_window(ts, gap) and the batch lag/cumsum query — must
    agree session-for-session on data engineered around the gap edge:
    a gap of exactly 30:00 MERGES in both (session_window treats an
    event landing exactly on the window end as part of it; the batch
    twin splits only on strictly-greater gaps), 30:01 splits, and
    same-timestamp bursts stay one session. session_window's end is
    last_ts + gap, so the mapping subtracts the gap."""
    import datetime as dt
    import random

    from web3_flight_rpc_server_spark.registry import all_queries

    rng = random.Random(29)
    base = dt.datetime(2024, 5, 1)
    gaps = [1799, 1800, 1801, 1, 300, 7200]
    rows, eid = [], 0
    for user in range(1, 13):
        t = rng.randrange(0, 1000)
        for _ in range(rng.randint(1, 25)):
            rows.append(
                (eid, base + dt.timedelta(seconds=t), user, "click",
                 round(rng.uniform(0, 5), 3), "{}")
            )
            eid += 1
            t += rng.choice(gaps)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    stream_form = {
        (r.user_id, r.session_start, r.session_end - dt.timedelta(minutes=30), r.n)
        for r in session_agg(df, gap="30 minutes").collect()
    }
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(d + "/events.parquet")
        batch = all_queries()["q_sessionize"].fn(spark, d)
        batch_form = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in batch.collect()
        }
    assert stream_form == batch_form
