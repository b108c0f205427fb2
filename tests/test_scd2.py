"""SCD2 history builder / incremental merge (operators/scd2.py)
against hand-computed interval truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.operators.scd2 import (
    asof_lookup,
    scd2_from_history,
    scd2_merge,
)


def _hist(spark, rows):
    return spark.createDataFrame(rows, "key string, ts long, label string")


def _rows(df):
    return {
        (r.key, r.label, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_intervals_and_noop_dropping(spark):
    scd = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("a", 20, "x"),   # no-op: same label -> no new version
        ("a", 30, "y"),
        ("b", 15, "z"),
    ]), key_col="key", ts_col="ts")
    assert _rows(scd) == {
        ("a", "x", 10, 30, False),
        ("a", "y", 30, None, True),
        ("b", "z", 15, None, True),
    }


def test_same_instant_ties_last_writer_wins_deterministically(spark):
    scd = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("a", 10, "w"),   # tie on ts: max attribute tuple wins
    ]))
    assert _rows(scd) == {("a", "x", 10, None, True)}


def test_merge_touches_only_changed_keys(spark):
    existing = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("b", 10, "y"),
    ]))
    merged = scd2_merge(existing, _hist(spark, [("a", 20, "x2")]))
    assert _rows(merged) == {
        ("a", "x", 10, 20, False),
        ("a", "x2", 20, None, True),
        ("b", "y", 10, None, True),
    }
    # rebuilding from the full history must agree (merge == rebuild)
    full = scd2_from_history(_hist(spark, [
        ("a", 10, "x"), ("b", 10, "y"), ("a", 20, "x2"),
    ]))
    assert _rows(merged) == _rows(full)


def test_merge_drops_noop_change(spark):
    existing = scd2_from_history(_hist(spark, [("a", 10, "x")]))
    merged = scd2_merge(existing, _hist(spark, [("a", 20, "x")]))
    assert _rows(merged) == {("a", "x", 10, None, True)}


def test_asof_lookup_resolves_version_at_fact_time(spark):
    scd = scd2_from_history(_hist(spark, [
        ("a", 10, "x"),
        ("a", 30, "y"),
    ]))
    facts = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 29), ("a", 30), ("a", 99), ("c", 50)],
        "key string, fts long",
    )
    got = {
        (r.key, r.fts, r.label)
        for r in asof_lookup(facts, scd, "key", "fts").collect()
    }
    assert got == {
        ("a", 5, None),      # before first version
        ("a", 10, "x"),
        ("a", 29, "x"),
        ("a", 30, "y"),      # boundary: valid_from inclusive
        ("a", 99, "y"),
        ("c", 50, None),     # unknown key
    }


def test_requires_attribute_columns(spark):
    with pytest.raises(ValueError):
        scd2_from_history(
            spark.createDataFrame([("a", 1)], "key string, ts long")
        )


def test_asof_lookup_colliding_columns_prefixed_or_refused(spark):
    """Facts sharing an attribute name with the dimension must either
    get an explicit prefix on the dimension's columns or fail loudly —
    never produce a duplicate-name schema that breaks the next
    select-by-name."""
    scd = scd2_from_history(_hist(spark, [("a", 10, "x"), ("a", 30, "y")]))
    facts = spark.createDataFrame(
        [("a", 20, "fact-label")], "key string, fts long, label string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_lookup(facts, scd, "key", "fts")
    out = asof_lookup(facts, scd, "key", "fts", prefix="dim_")
    assert out.columns.count("label") == 1
    row = out.select("key", "fts", "label", "dim_label").collect()[0]
    assert (row.key, row.fts, row.label, row.dim_label) == (
        "a", 20, "fact-label", "x"
    )


@pytest.mark.parametrize("seed", [3, 41, 977])
def test_merge_equals_rebuild_on_random_histories(spark, seed):
    """The merge's core contract — applying change batches
    incrementally must land on exactly the intervals a one-shot
    rebuild over the full history produces — fuzzed over random
    histories with no-op repeats and same-instant ties, delivered in
    timestamp order (the CDC contract the merge documents; ties may
    still split across batch boundaries)."""
    import random

    rng = random.Random(seed)
    labels = ["x", "y", "z", "w"]
    history = []
    for key in "abcdefgh":
        t = rng.randrange(0, 5)
        for _ in range(rng.randint(1, 12)):
            history.append((key, t, rng.choice(labels)))
            if rng.random() < 0.2:  # same-instant tie
                history.append((key, t, rng.choice(labels)))
            t += rng.randint(1, 20)
    history.sort(key=lambda r: (r[1], r[0], r[2]))  # in-order delivery
    cuts = sorted(rng.sample(range(1, len(history)), 3))
    batches = [
        history[lo:hi]
        for lo, hi in zip([0, *cuts], [*cuts, len(history)])
        if history[lo:hi]
    ]
    scd = scd2_from_history(_hist(spark, batches[0]))
    for batch in batches[1:]:
        scd = scd2_merge(scd, _hist(spark, batch))
    full = scd2_from_history(_hist(spark, history))
    assert _rows(scd) == _rows(full), f"seed={seed}"


def test_out_of_order_merge_caveat_worked_example(spark):
    """The documented CDC caveat, pinned: a back-dated change landing
    inside an already-collapsed span yields a VALID interval set, but
    not necessarily the full-history rebuild — the build dropped the
    (a, 20, x) repeat as a no-op, and the merge cannot resurrect it
    once (a, 15, y) makes it a real change."""
    scd = scd2_from_history(_hist(spark, [("a", 10, "x"), ("a", 20, "x")]))
    merged = scd2_merge(scd, _hist(spark, [("a", 15, "y")]))
    assert _rows(merged) == {
        ("a", "x", 10, 15, False),
        ("a", "y", 15, None, True),   # x@20 was dropped at build time
    }
    full = scd2_from_history(_hist(spark, [
        ("a", 10, "x"), ("a", 20, "x"), ("a", 15, "y"),
    ]))
    assert _rows(full) == {
        ("a", "x", 10, 15, False),
        ("a", "y", 15, 20, False),
        ("a", "x", 20, None, True),
    }
    # both are internally consistent: contiguous intervals, one current
    for rows in (_rows(merged), _rows(full)):
        cur = [r for r in rows if r[4]]
        assert len(cur) == 1 and cur[0][3] is None


def test_streaming_maintenance_replay_republishes_identical(spark, tmp_path):
    """Dimension maintenance from a CDC stream: in-order change
    batches fold in via scd2_merge and publish pointer-flipped
    versions. A forced engine replay (checkpoint restore) re-merges an
    already-applied batch — idempotent under the CDC contract, so the
    final dimension still equals the one-shot rebuild, and pruning
    keeps the version directory bounded."""
    import os
    import shutil

    from web3_flight_rpc_server_spark.operators.scd2 import (
        read_scd2,
        streaming_scd2_maintenance,
    )

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    ckpt_bak = str(tmp_path / "ckpt_bak")
    os.makedirs(src)
    schema = "key string, ts long, label string"
    batches = [
        [("a", 10, "x"), ("b", 10, "p")],
        [("a", 20, "y"), ("c", 25, "q")],
        [("b", 30, "r"), ("a", 30, "y")],  # a@30 is a no-op repeat
    ]

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start():
        return streaming_scd2_maintenance(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            dim,
            checkpoint=ckpt,
            keep_versions=2,
        )

    drop(batches[0])
    drop(batches[1])
    q = start()
    q.processAllAvailable()
    q.stop()
    shutil.copytree(ckpt, ckpt_bak)
    drop(batches[2])
    q = start()
    q.processAllAvailable()
    q.stop()
    want = _rows(
        scd2_from_history(_hist(spark, [r for b in batches for r in b]))
    )
    assert _rows(read_scd2(spark, dim)) == want
    # crash: restore stale checkpoint -> engine replays the last batch
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_bak, ckpt)
    q = start()
    q.processAllAvailable()
    q.stop()
    assert _rows(read_scd2(spark, dim)) == want, "replay changed the dim"
    versions = [d for d in os.listdir(dim) if d.startswith("v=")]
    assert len(versions) <= 2  # pruned to keep_versions


def test_pointer_resolution_and_loud_failure(spark, tmp_path):
    """The versioned-pointer publish (ADVICE r4): readers resolve max
    over _LATEST.<v> files (no single-file delete-then-rename window);
    an unpointed version directory is invisible; a dimension with
    version data but NO pointer fails loudly instead of silently
    rebuilding from one micro-batch; legacy single-file _LATEST is
    still honored."""
    import os

    from web3_flight_rpc_server_spark.operators.scd2 import (
        read_scd2,
        streaming_scd2_maintenance,
    )

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    os.makedirs(src)
    schema = "key string, ts long, label string"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start(ckpt):
        return streaming_scd2_maintenance(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            dim,
            checkpoint=str(tmp_path / ckpt),
        )

    drop([("a", 10, "x")])
    drop([("a", 20, "y")])
    q = start("ckpt")
    q.processAllAvailable()
    q.stop()

    # versioned pointers exist, the legacy single file does not
    names = sorted(os.listdir(dim))
    assert any(n.startswith("_LATEST.") for n in names)
    assert "_LATEST" not in names
    want = _rows(read_scd2(spark, dim))
    assert {r[:2] for r in want} >= {("a", "y")}

    # an unpointed (half-published) version directory is invisible
    newest = max(
        int(n[len("_LATEST."):]) for n in names if n.startswith("_LATEST.")
    )
    spark.createDataFrame(
        [("zz", "junk", 0, None, True)],
        "key string, label string, valid_from long, valid_to long, "
        "is_current boolean",
    ).write.mode("overwrite").parquet(f"{dim}/v={newest + 50}")
    assert _rows(read_scd2(spark, dim)) == want

    # legacy layout: only a single _LATEST file naming a version
    for n in os.listdir(dim):
        if n.startswith("_LATEST."):
            os.remove(os.path.join(dim, n))
    import struct

    payload = str(newest).encode()
    with open(os.path.join(dim, "_LATEST"), "wb") as fh:
        fh.write(struct.pack(">H", len(payload)) + payload)  # writeUTF
    assert _rows(read_scd2(spark, dim)) == want

    # pointer lost entirely but version dirs remain: the maintenance
    # loop must refuse to rebuild from one micro-batch
    os.remove(os.path.join(dim, "_LATEST"))
    with pytest.raises(ValueError, match="no published"):
        read_scd2(spark, dim)
    drop([("b", 30, "z")])
    q = start("ckpt2")
    with pytest.raises(Exception, match="refusing to rebuild"):
        q.processAllAvailable()
        q.awaitTermination()
    q.stop()


def test_first_batch_replay_after_crash_before_pointer_publish(
    spark, tmp_path
):
    """A crash between the FIRST batch's version write and its pointer
    publish leaves v=0 unpointed. The replay (same batch id, fresh
    engine) overwrites that very directory, so the from-scratch
    fallback is safe there — and must not trip the loud
    stranded-versions guard."""
    import os

    from web3_flight_rpc_server_spark.operators.scd2 import (
        read_scd2,
        streaming_scd2_maintenance,
    )

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    os.makedirs(src)
    schema = "key string, ts long, label string"
    spark.createDataFrame(
        [("a", 10, "x")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    # simulate the crash artifact: a complete but unpointed v=0
    spark.createDataFrame(
        [("zz", "stale", 0, None, True)],
        "key string, label string, valid_from long, valid_to long, "
        "is_current boolean",
    ).write.mode("overwrite").parquet(f"{dim}/v=0")

    q = streaming_scd2_maintenance(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        dim,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = _rows(read_scd2(spark, dim))
    assert {r[:2] for r in rows} == {("a", "x")}  # stale v=0 replaced
