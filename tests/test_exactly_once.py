"""Exactly-once epoch-manifest sink (streaming/exactly_once.py).

The property under test is idempotence under the two failure shapes
foreachBatch actually produces: a REPLAY of a committed epoch (crash
after marker, before checkpoint commit) and a RETRY of a torn epoch
(crash mid-write, no marker). The end-to-end case forces a genuine
engine replay by restoring a stale checkpoint — the filesystem
equivalent of dying between the sink and the offset commit."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.streaming.exactly_once import (
    ExactlyOnceParquetSink,
    read_committed,
)

SCHEMA = "event_id long, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_replayed_epoch_is_dropped_whole(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    sink(_df(spark, [(1, "a"), (2, "b")]), 0)
    sink(_df(spark, [(3, "c")]), 1)
    # engine replay of epoch 1 — even with different-looking content,
    # the committed marker wins and nothing changes
    sink(_df(spark, [(3, "c"), (99, "GARBAGE")]), 1)
    got = {
        (r.event_id, r.v, r.epoch) for r in read_committed(spark, out).collect()
    }
    assert got == {(1, "a", 0), (2, "b", 0), (3, "c", 1)}
    assert sink.committed_epochs(spark) == [0, 1]


def test_torn_epoch_is_invisible_then_retried_clean(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(out)
    sink(_df(spark, [(1, "a")]), 0)
    # simulate a crash mid-write: epoch dir exists with garbage bytes,
    # no marker
    torn = tmp_path / "sink" / "data" / "epoch=1"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet").write_bytes(b"not parquet")
    got = {(r.event_id, r.epoch) for r in read_committed(spark, out).collect()}
    assert got == {(1, 0)}, "torn epoch leaked into the committed view"
    # the retry overwrites the torn dir and commits
    sink(_df(spark, [(2, "b")]), 1)
    got = {(r.event_id, r.epoch) for r in read_committed(spark, out).collect()}
    assert got == {(1, 0), (2, 1)}


def test_transform_runs_inside_the_epoch(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = ExactlyOnceParquetSink(
        out, transform=lambda df: df.where(F.col("event_id") % 2 == 0)
    )
    sink(_df(spark, [(1, "a"), (2, "b"), (4, "c")]), 0)
    got = {r.event_id for r in read_committed(spark, out).collect()}
    assert got == {2, 4}


def test_no_committed_epochs_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed epochs"):
        read_committed(spark, str(tmp_path / "nothing"))


def test_engine_replay_after_checkpoint_restore(spark, tmp_path):
    """Force a real engine replay: run a file-source stream through the
    sink, snapshot the checkpoint, process one more file, then restore
    the stale checkpoint and restart — the engine re-offers the last
    epoch and the sink must drop it."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ckpt_bak = str(tmp_path / "ckpt_bak")
    os.makedirs(src)
    sink = ExactlyOnceParquetSink(out)

    def start():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    _df(spark, [(1, "a")]).coalesce(1).write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()
    shutil.copytree(ckpt, ckpt_bak)  # crash snapshot: epoch 0 committed
    _df(spark, [(2, "b")]).coalesce(1).write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()
    # "crash": lose the checkpoint progress for the last epoch, keeping
    # the sink's state — on restart the engine replays that epoch
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_bak, ckpt)
    q = start()
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        (r.event_id, r.epoch) for r in read_committed(spark, out).collect()
    )
    assert rows == [(1, 0), (2, 1)], f"replayed epoch duplicated: {rows}"
