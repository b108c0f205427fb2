"""SCD2 (slowly-changing-dimension, type 2) history builder and
incremental merge.

The engine's dimension surfaces — address labels, contract metadata,
token registries — change over time, and an analytical join needs the
value AS OF the fact's timestamp, not the latest one. SCD2 models
that as validity intervals: one row per (key, version) with
``valid_from`` / ``valid_to`` (null = current). The as-of join then
becomes a plain range join (C2's q_join_range shape) instead of a
stateful lookup.

Two operators:

- :func:`scd2_from_history` — batch: collapse a change log into
  intervals (one window pass per key: lead() for valid_to, a lag()
  comparison to drop no-op changes first).
- :func:`scd2_merge` — incremental: fold a new change batch into an
  existing SCD2 table touching ONLY the changed keys (anti-join keeps
  the untouched majority byte-identical; the changed slice is
  rebuilt). At 100 TB the change batch is tiny relative to the
  dimension, so the rebuild work is O(changed keys), and writing the
  result partitioned by key-hash keeps the anti-join co-located.

The reference has no dimension versioning at all (its closest analog
is the ``removed`` reorg flag it forwards and ignores,
Converter.java:169); C17's reorg retraction keeps the LAST version
per key, while SCD2 keeps them all with validity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _attr_cols(df: DataFrame, key_col: str, ts_col: str) -> list[str]:
    return [c for c in df.columns if c not in (key_col, ts_col)]


def scd2_from_history(changes: DataFrame, key_col: str = "key",
                      ts_col: str = "ts",
                      drop_noops: bool = True) -> DataFrame:
    """Collapse a change log (key, ts, attrs...) into SCD2 rows
    (key, attrs..., valid_from, valid_to, is_current).

    Ties on (key, ts) are resolved deterministically: the row with the
    largest attribute tuple wins (a real feed should not emit two
    changes for one key at one instant; the tie-break makes replays
    stable anyway). ``drop_noops`` removes versions whose attributes
    equal the previous version's, so intervals only break on real
    change."""
    attrs = _attr_cols(changes, key_col, ts_col)
    if not attrs:
        raise ValueError("changes must carry at least one attribute column")
    # attrs ascending within a ts tie: the max-__rn row kept by the
    # tie dedup below is then the LARGEST attribute tuple
    w_ts = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), *[F.col(a) for a in attrs]
    )
    ranked = changes.withColumn("__rn", F.row_number().over(w_ts))
    # last writer wins per (key, ts): keep the max __rn per (key, ts)
    w_tie = Window.partitionBy(key_col, ts_col)
    deduped = (
        ranked.withColumn("__mx", F.max("__rn").over(w_tie))
        .where(F.col("__rn") == F.col("__mx"))
        .drop("__mx")
    )
    if drop_noops:
        prev = [
            F.lag(a).over(Window.partitionBy(key_col).orderBy("__rn")).alias(
                f"__p_{a}"
            )
            for a in attrs
        ]
        # window expressions must land in a Project before the filter
        # (window functions are not allowed inside WHERE)
        with_prev = deduped.select(
            "*",
            *prev,
            (
                F.col("__rn")
                == F.min("__rn").over(Window.partitionBy(key_col))
            ).alias("__first"),
        )
        changed = F.lit(False)
        for a in attrs:
            changed = changed | ~(
                F.col(a).eqNullSafe(F.col(f"__p_{a}"))
            )
        deduped = with_prev.where(F.col("__first") | changed).drop(
            "__first", *[f"__p_{a}" for a in attrs]
        )
    w_next = Window.partitionBy(key_col).orderBy("__rn")
    return (
        deduped.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w_next))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__rn", ts_col)
    )


def scd2_merge(existing: DataFrame, changes: DataFrame,
               key_col: str = "key", ts_col: str = "ts") -> DataFrame:
    """Fold a change batch into an existing SCD2 table.

    Untouched keys pass through unchanged (left_anti on the change
    keys — no window work for them); changed keys are rebuilt from
    their existing versions plus the new changes, which also closes
    the previously-current interval. Equivalent to rebuilding from the
    full concatenated history, at O(changed keys) window cost — PER
    THE CDC DELIVERY CONTRACT: batches arrive per key in
    nondecreasing timestamp order (same-instant ties may split across
    batches; the tie-break is replay-stable). A batch that
    time-travels INTO an already-collapsed span still produces a valid
    non-overlapping interval set, but equality with the full-history
    rebuild is not guaranteed there: the build drops no-op changes, so
    a repeat that was a no-op at build time (and was dropped) cannot
    be resurrected when a back-dated change later lands before it and
    would have made it a real change. Fuzzed in tests/test_scd2.py;
    the out-of-order caveat is pinned there as a worked example."""
    attrs = _attr_cols(
        existing, key_col, "valid_from"
    )
    attrs = [a for a in attrs if a not in ("valid_to", "is_current")]
    change_keys = changes.select(key_col).distinct()
    untouched = existing.join(change_keys, key_col, "left_anti")
    touched_hist = (
        existing.join(change_keys, key_col, "left_semi")
        .select(key_col, F.col("valid_from").alias(ts_col), *attrs)
    )
    rebuilt = scd2_from_history(
        touched_hist.unionByName(changes.select(key_col, ts_col, *attrs)),
        key_col, ts_col,
    )
    return untouched.unionByName(rebuilt)


def asof_lookup(facts: DataFrame, scd2: DataFrame, key_col: str,
                fact_ts_col: str, prefix: str = "") -> DataFrame:
    """Join each fact to the dimension version valid at its timestamp
    — a plain range join (broadcastable when the dimension is small;
    at scale, both sides pre-partitioned by key).

    The joined schema must be unambiguous by NAME, not just by
    attribute reference — downstream ``select("col")`` calls fail on
    duplicates. Dimension columns that collide with a facts column
    (shared attribute names, or facts that themselves carry
    valid_from/valid_to/is_current) are renamed with ``prefix``; with
    the default empty prefix a collision raises instead of producing a
    schema that breaks one select later."""
    dim_cols = [c for c in scd2.columns if c != key_col]
    clash = sorted(set(dim_cols) & set(facts.columns))
    if clash:
        if not prefix:
            raise ValueError(
                f"dimension columns {clash} collide with fact columns; "
                "pass prefix= (e.g. 'dim_') to disambiguate the output "
                "schema"
            )
        dim = scd2.select(
            key_col,
            *[F.col(c).alias(prefix + c) for c in dim_cols],
        )
        vfrom, vto = prefix + "valid_from", prefix + "valid_to"
    else:
        dim, vfrom, vto = scd2, "valid_from", "valid_to"
    cond = (
        (facts[key_col] == dim[key_col])
        & (facts[fact_ts_col] >= dim[vfrom])
        & (
            dim[vto].isNull()
            | (facts[fact_ts_col] < dim[vto])
        )
    )
    return facts.join(dim, cond, "left").drop(dim[key_col])


def _latest_pointer(spark, dim_dir: str):
    jvm = spark._jvm
    ptr = jvm.org.apache.hadoop.fs.Path(f"{dim_dir}/_LATEST")
    fs = ptr.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm, ptr


def _pointer_versions(spark, dim_dir: str) -> list[int]:
    """Published versions, from the per-version pointer files
    ``_LATEST.<version>``. A pointer file is only created AFTER its
    version directory is fully written, and pruning deletes the
    pointer before the directory, so every listed version is readable."""
    fs, jvm, _ = _latest_pointer(spark, dim_dir)
    base = jvm.org.apache.hadoop.fs.Path(dim_dir)
    if not fs.exists(base):
        return []
    versions = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if name.startswith("_LATEST."):
            try:
                versions.append(int(name[len("_LATEST."):]))
            except ValueError:
                continue
    return sorted(versions)


def _version_dirs(spark, dim_dir: str) -> list[int]:
    fs, jvm, _ = _latest_pointer(spark, dim_dir)
    base = jvm.org.apache.hadoop.fs.Path(dim_dir)
    if not fs.exists(base):
        return []
    out = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def read_scd2(spark, dim_dir: str) -> DataFrame:
    """Current dimension state: the HIGHEST published version.

    Publication is a set of per-version pointer files
    (``_LATEST.<version>``), each created atomically (write-tmp +
    rename) AFTER its version directory is complete; the reader
    resolves max over them, so there is no single pointer file whose
    replacement could crash half-done — the delete-then-rename window
    the old single ``_LATEST`` file had (a crash between the two left
    NO pointer, and the maintenance loop then silently rebuilt the
    dimension from one micro-batch). Readers never see a half-written
    version: an unpointed ``v=`` directory is simply invisible.
    Legacy single-file ``_LATEST`` pointers are still honored when no
    versioned pointer exists."""
    versions = _pointer_versions(spark, dim_dir)
    if versions:
        return spark.read.parquet(f"{dim_dir}/v={versions[-1]}")
    fs, jvm, ptr = _latest_pointer(spark, dim_dir)
    if fs.exists(ptr):  # legacy layout
        stream = fs.open(ptr)
        try:
            version = stream.readUTF()
        finally:
            stream.close()
        return spark.read.parquet(f"{dim_dir}/v={version}")
    raise ValueError(f"no published SCD2 version under {dim_dir}")


def publish_scd2_version(spark, dim_dir: str, dim: DataFrame,
                         version: int, keep_versions: int = 3) -> None:
    """Write and PUBLISH one complete dimension state as
    ``v=<version>``: write the directory, create the per-version
    pointer ``_LATEST.<version>`` atomically (write-tmp + rename —
    versioned names never collide across batches, so there is no
    delete-then-rename window; a replay finds its pointer already
    present and the failed rename just drops the tmp), retire any
    legacy single-file pointer, then prune versions beyond
    ``keep_versions`` — pointer file FIRST, directory second, so no
    pointer ever names a missing version. This is the streaming
    maintenance loop's publish step, factored out so batch jobs and
    drills exercise the SAME flip protocol readers race against
    (read_scd2 resolves max over the pointers)."""
    dim.write.mode("overwrite").parquet(f"{dim_dir}/v={version}")
    fs, jvm, legacy = _latest_pointer(spark, dim_dir)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{dim_dir}/._LATEST.{version}.tmp"
    )
    out = fs.create(tmp, True)
    try:
        out.writeUTF(str(version))
    finally:
        out.close()
    ptr = jvm.org.apache.hadoop.fs.Path(f"{dim_dir}/_LATEST.{version}")
    if not fs.rename(tmp, ptr):
        fs.delete(tmp, False)
    # a legacy single-file pointer is superseded the moment a
    # versioned pointer exists (readers prefer versioned); drop it
    # so it can't name a version pruning is about to delete
    if fs.exists(legacy):
        fs.delete(legacy, False)
    for v in _version_dirs(spark, dim_dir)[:-keep_versions]:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{dim_dir}/_LATEST.{v}"),
            False,
        )
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{dim_dir}/v={v}"), True)


def streaming_scd2_maintenance(change_stream: DataFrame, dim_dir: str,
                               key_col: str = "key", ts_col: str = "ts",
                               checkpoint: str | None = None,
                               keep_versions: int = 3):
    """Maintain an SCD2 dimension from a CDC change stream: each
    micro-batch folds into the current dimension via scd2_merge and
    publishes a NEW version directory (v=<batchId>), then creates a
    per-version pointer file _LATEST.<batchId> (write-tmp + rename,
    atomic on HDFS/local — the same commit idiom as
    streaming/exactly_once.py). Readers resolve max over the pointer
    files, so they always see a complete version and there is never a
    pointer-less instant (the old single-_LATEST flip had a
    delete-then-rename crash window); concurrent as-of joins keep
    reading the previous version until the new pointer lands.

    Replay safety needs no epoch manifest here: under in-order CDC
    delivery (the contract scd2_merge documents) re-merging an
    already-applied batch is IDEMPOTENT — the replayed (key, ts)
    change rows collide with their first copies and the tie-dedup
    keeps one, so the republished version is byte-identical
    (pinned in tests/test_scd2.py with a forced engine replay).

    Old versions beyond ``keep_versions`` are pruned after each flip;
    keep more for long-running readers. Returns the StreamingQuery.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        changes = batch_df.select(key_col, ts_col, *[
            c for c in batch_df.columns if c not in (key_col, ts_col)
        ])
        # The from-scratch fallback is legitimate ONLY when this is
        # genuinely the dimension's first batch. A lost/corrupt pointer
        # with version data still on disk must fail loudly — silently
        # rebuilding from one micro-batch would discard all prior
        # history (and a broad except here used to also mask
        # scd2_merge's own ValueErrors). One exception: a replay of the
        # first batch after a crash BETWEEN its version write and its
        # pointer publish leaves exactly v=<batch_id> unpointed — this
        # replay is about to overwrite that very directory, so
        # rebuilding loses nothing.
        current = None
        try:
            current = read_scd2(spark, dim_dir)
        except ValueError:
            stranded = [
                v for v in _version_dirs(spark, dim_dir) if v != batch_id
            ]
            if stranded:
                raise RuntimeError(
                    f"SCD2 dim at {dim_dir!r} has version directories "
                    f"{stranded} but no readable pointer — refusing to "
                    "rebuild from a single micro-batch; restore a "
                    "_LATEST.<version> pointer to the newest complete "
                    "version"
                )
        if current is not None:
            merged = scd2_merge(current, changes, key_col, ts_col)
        else:
            merged = scd2_from_history(changes, key_col, ts_col)
        # materialize BEFORE writing: on an engine replay the latest
        # pointer names v=<batch_id> itself (published by the replayed
        # batch's first run), so an un-cut plan would read the very
        # directory the overwrite below is deleting
        merged = merged.localCheckpoint(eager=True)
        publish_scd2_version(spark, dim_dir, merged, batch_id,
                             keep_versions)

    writer = change_stream.writeStream.foreachBatch(_process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
