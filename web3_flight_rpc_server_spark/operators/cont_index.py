"""Persistent CONTAINMENT index: incremental quoted-extract /
partial-copy checking of new batches against an already-indexed
corpus — the index twin of
operators/winnowing.py:containment_pairs_blocked, completing the
batch + index + stream pattern for the one dedup family that lacked
it (r13 VERDICT #4; every other tier — MinHash, fingerprint,
semantic, span — already has all three forms in
operators/incremental.py / fp_index.py / semdedup.py / span_index.py).

Production shape: training documents arrive continuously; a new batch
must not re-admit text that is mostly QUOTED INSIDE the historical
corpus (directed containment C(new -> idx) = |S_new ∩ S_idx| / |S_new|
— the class symmetric-Jaccard banding structurally misses, because
Jaccard -> 0 for a short doc inside a long one). Per micro-batch:

    1. batch-internal resolution — in-batch pairs from the same
       propose+confirm composition; the CONTAINED side loses (it adds
       mostly-duplicated content), mutual containment falls back to
       the min-id keeper, transitive losers follow their chain.
    2. probe — the batch's winnowing fingerprints equi-join the
       index's (fp, owner) rows (df-capped per the manifest, owner
       self-matches excluded), candidates clearing ``min_shared``
       confirm with an in-row array_intersect against the STORED
       index shingle sets — candidate-bounded, nothing
       corpus-quadratic, the containment_pairs_blocked cost shape.
    3. admission — a batch doc contained in an indexed doc
       (C(new -> idx) >= threshold) is rejected; the reverse
       direction (an indexed doc contained in the new one) is
       reported in dup_pairs for audit but does NOT reject — the new
       doc carries novel content and the index holds the canon.
    4. append — admitted docs' distinct (fp, owner) rows, shingle
       sets and per-append (fp, n) df deltas land; ids already
       present are excluded first, so crash-replayed appends are
       no-ops.

Replay self-healing is the span-index discipline: index fp rows carry
their owner id and probes exclude rows owned by the probing document
itself, so a batch replayed after a crash re-derives its admission
decisions against exactly what its first run saw, re-appends
idempotently, and hands the SAME admitted set to ``on_admitted``
again — downstream delivery is at-least-once end to end with no
join-back needed (the decision is deterministic, unlike the span
twin's identity short-circuit).

Index layout at ``root``: ``manifest/`` (1-row parquet pinning the
n-gram order, winnowing k/w, min_shared, max_df, hash tier and
storage tier — reopening with different windowing raises: a probe
fingerprinted differently would never collide and silently admit
every duplicate), ``fps/`` ((fp: long, doc_id) — distinct winnowed
fingerprints per admitted doc), ``shingles/`` ((doc_id, shs, sz) —
the n-gram sets the exact confirm joins), ``fp_stats/`` (per-append
(fp, n) document-frequency deltas, folded with SUM — probes exclude
fps whose indexed df exceeds ``max_df``, the stop-fingerprint cap
that bounds the equi-join against boilerplate).

Scale shape: ``fps_table`` selects the metastore tier for the fps
dataset — a bucketed table CLUSTERED BY (fp) whose pinned hash
partitioning satisfies the probe join's distribution requirement, so
a probe shuffles ONLY the batch side however large the indexed corpus
grows (the span/fp/bands-table contract, plan-asserted in
tests/test_cont_index.py). The confirm stage joins the batch-bounded
candidate list against the shingles dataset — broadcastable
candidates, no index-side shuffle. ``compact_containment_index``
folds per-append small files: directories through the crash-safe
three-step swap (operators/fswap.py), the fps table through the
metastore-level fswap.swap_table, df deltas through the associative
SUM — probes bit-identical before/after, and
``streaming_ingest_containment(compact_every=N)`` runs it inside
foreachBatch where serial micro-batches make "never concurrent with
an append" hold by construction.

No counterpart in the reference (its dedup surface is the exact
passthrough, Converter.java:169); the recall statement is
containment_pairs_blocked's, inherited verbatim: propose sees only
contiguous shared spans >= w + k - 1 chars (the winnowing guarantee),
confirm is exact on the candidate set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..functions.localdf import local_df

from .incremental import _read_recovering, _sub

_HASH_TIERS = ("xxhash64", "md5_prefix60")


def _hash_fn(tier: str):
    if tier == "xxhash64":
        return lambda c: F.xxhash64(c)
    if tier == "md5_prefix60":
        from ..functions.hashing import md5_prefix60

        return md5_prefix60
    raise ValueError(
        f"unknown containment-index hash tier {tier!r} "
        f"(known: {_HASH_TIERS})"
    )


@dataclass(frozen=True)
class ContIndexManifest:
    """The layout a containment index was built with — recorded with
    the data so probes and appends can never fingerprint or shingle
    differently (the incremental/fp_index/span manifest convention)."""
    n: int
    k: int
    w: int
    min_shared: int
    max_df: int
    hash: str = "xxhash64"
    fps_table: str | None = None
    buckets: int = 0

    @property
    def layout(self) -> tuple[int, int, int]:
        return (self.n, self.k, self.w)


def _read_cont_manifest(spark: SparkSession,
                        path: str) -> ContIndexManifest:
    try:
        row = spark.read.parquet(_sub(path, "manifest")).collect()[0]
    except AnalysisException as exc:
        raise FileNotFoundError(
            f"no containment index at {path!r} — write the first "
            "corpus snapshot with write_containment_index() before "
            "probing it"
        ) from exc
    d = row.asDict()
    m = ContIndexManifest(
        int(row.n), int(row.k), int(row.w), int(row.min_shared),
        int(row.max_df), d.get("hash") or "xxhash64",
        d.get("fps_table"), int(d.get("buckets") or 0),
    )
    _hash_fn(m.hash)  # refuse a tier this build does not speak
    return m


def _read_fps(spark: SparkSession, path: str,
              m: ContIndexManifest) -> DataFrame:
    if m.fps_table:
        from .fswap import recover_table

        recover_table(spark, m.fps_table)
        return spark.table(m.fps_table)
    return _read_recovering(spark, _sub(path, "fps"))


def _batch_arrays(docs: DataFrame, m: ContIndexManifest, id_col: str,
                  text_col: str) -> DataFrame:
    """Persisted winnow_fingerprints arrays of a corpus under the
    manifest's windowing (the 50x explode re-evaluation trap,
    operators/winnowing.py:96-100). Hosts that need fps, internal
    pairs AND the append featurize ONCE through this and inject the
    frame downstream (the incremental-module _sets convention)."""
    from .dedup import _persisted
    from .winnowing import winnow_fingerprints

    return _persisted(winnow_fingerprints(
        docs, m.k, m.w, id_col, text_col, _hash_fn(m.hash)
    ))


def _batch_fps(docs: DataFrame, m: ContIndexManifest, id_col: str,
               text_col: str,
               _arrays: DataFrame | None = None) -> DataFrame:
    """Distinct (fp, id) winnowing-fingerprint rows of a corpus under
    the manifest's windowing. ``_arrays`` (covering at least ``docs``'
    ids) skips re-featurizing; rows are scoped to ``docs`` by a
    semi-join."""
    arrays = (
        _arrays.join(
            F.broadcast(docs.select(id_col).distinct()), id_col,
            "left_semi",
        )
        if _arrays is not None
        else _batch_arrays(docs, m, id_col, text_col)
    )
    return arrays.select(
        id_col, F.explode("fingerprints").alias("fp")
    ).select("fp", id_col)


def write_containment_index(docs: DataFrame, path: str,
                            n: int | None = None,
                            k: int | None = None,
                            w: int | None = None,
                            min_shared: int | None = None,
                            max_df: int | None = None,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            append: bool = False,
                            hash: str = "xxhash64",
                            fps_table: str | None = None,
                            buckets: int = 64,
                            _arrays: DataFrame | None = None,
                            _sets: DataFrame | None = None) -> None:
    """Write (or append a new batch to) the containment index.

    ``append=True`` is the ingestion loop: after a batch passes
    :func:`ingest_containment_batch`'s admission, index its survivors
    so the NEXT batch is checked against them too. Layout (windowing,
    n-gram order, caps, hash and storage tier) comes from the manifest
    on append — ValueError on a mismatched request, a probe windowed
    differently would never collide. Appends exclude ids already
    present in each dataset (the fp_index/incremental idempotent-
    append discipline), and the df deltas are computed AFTER the
    exclusion so crash-replays cannot inflate them; like those twins
    the three appends are not atomic — a crash between them leaves a
    doc half-indexed, healed by the replay completing the missing
    parts without duplicating the rest."""
    from .dedup import _persisted, shingle_sets
    from .fswap import recover_directory, recover_table

    spark = docs.sparkSession
    if append:
        m = _read_cont_manifest(spark, path)
        # None means "use the manifest"; explicit mismatches refused —
        # for the windowing (a re-windowed probe would never collide)
        # AND the probe-behavior knobs (a silently dropped cap/floor
        # request would make the caller believe a contract the index
        # does not honor)
        asked = tuple(
            v if v is not None else have
            for v, have in zip((n, k, w), m.layout)
        )
        if asked != m.layout:
            raise ValueError(
                f"index at {path!r} was built with (n, k, w)="
                f"{m.layout}; append requested {asked} — "
                "re-windowing an existing index silently breaks "
                "collisions, rebuild instead"
            )
        for arg, have, what in (
            (min_shared, m.min_shared, "min_shared"),
            (max_df, m.max_df, "max_df"),
        ):
            if arg is not None and arg != have:
                raise ValueError(
                    f"index at {path!r} was built with {what}={have}; "
                    f"append requested {arg} — the cap/floor is "
                    "manifest-pinned (a probe contract), rebuild "
                    "instead"
                )
        if hash != "xxhash64" and hash != m.hash:
            raise ValueError(
                f"index at {path!r} was built with hash tier "
                f"{m.hash!r}; append requested {hash!r} — mixed hash "
                "spaces would never collide, rebuild instead"
            )
    else:
        m = ContIndexManifest(
            3 if n is None else n, 12 if k is None else k,
            6 if w is None else w,
            2 if min_shared is None else min_shared,
            50 if max_df is None else max_df,
            hash, fps_table, buckets if fps_table else 0,
        )
        _hash_fn(hash)

    fps = _batch_fps(docs, m, id_col, text_col,
                     _arrays=_arrays).localCheckpoint(eager=True)
    sets = (
        _sets.join(
            F.broadcast(docs.select(id_col).distinct()), id_col,
            "left_semi",
        )
        if _sets is not None
        else _persisted(shingle_sets(docs, id_col, text_col, m.n))
    )

    def _write_fps(df: DataFrame, write_mode: str) -> None:
        if m.fps_table:
            recover_table(spark, m.fps_table)
            # one file per non-empty bucket per append (the span
            # tier's repartition-into-bucket-layout discipline)
            (
                df.repartition(m.buckets, "fp")
                .write.mode(write_mode)
                .bucketBy(m.buckets, "fp").sortBy("fp")
                .saveAsTable(m.fps_table)
            )
        else:
            df.write.mode(write_mode).parquet(_sub(path, "fps"))

    def _write_stats(df: DataFrame, write_mode: str) -> None:
        df.groupBy("fp").agg(F.count("*").alias("n")).write.mode(
            write_mode
        ).parquet(_sub(path, "fp_stats"))

    if append:
        subs = ["shingles", "fp_stats"] if m.fps_table else [
            "fps", "shingles", "fp_stats"
        ]
        for sub in subs:
            recover_directory(spark, _sub(path, sub))
        batch_ids = F.broadcast(
            docs.select(id_col).distinct()
        )
        for sub, df_out, writer in (
            ("fps", fps, _write_fps),
            ("shingles", sets, None),
        ):
            try:
                existing = (
                    _read_fps(spark, path, m) if sub == "fps"
                    else spark.read.parquet(_sub(path, sub))
                )
                present = (
                    existing.select(id_col)
                    .join(batch_ids, id_col, "left_semi")
                    .distinct()
                    .localCheckpoint(eager=True)
                )
            except AnalysisException:
                present = None
            if present is not None and not present.isEmpty():
                df_out = df_out.join(
                    F.broadcast(present), id_col, "left_anti"
                )
                if sub == "fps":
                    df_out = df_out.localCheckpoint(eager=True)
            if writer is not None:
                writer(df_out, "append")
                # df deltas from exactly the rows that landed
                _write_stats(df_out, "append")
            else:
                df_out.write.mode("append").parquet(_sub(path, sub))
    else:
        _write_fps(fps, "overwrite")
        _write_stats(fps, "overwrite")
        sets.write.mode("overwrite").parquet(_sub(path, "shingles"))
        local_df(
            spark,
            [(m.n, m.k, m.w, m.min_shared, m.max_df, m.hash,
              m.fps_table, m.buckets)],
            "n int, k int, w int, min_shared int, max_df int, "
            "hash string, fps_table string, buckets int",
        ).write.mode("overwrite").parquet(_sub(path, "manifest"))


def cont_index_hot_fps(spark: SparkSession, path: str) -> DataFrame:
    """Stop fingerprints: fps whose folded indexed document frequency
    exceeds the manifest cap — what probes exclude (boilerplate,
    license headers; they carry no pair-discrimination signal and are
    exactly the equi-join skew that must be capped at scale)."""
    m = _read_cont_manifest(spark, path)
    return (
        _read_recovering(spark, _sub(path, "fp_stats"))
        .groupBy("fp").agg(F.sum("n").alias("df"))
        .where(F.col("df") > m.max_df)
        .select("fp")
    )


def containment_against_index(new_docs: DataFrame, path: str,
                              threshold: float,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              _arrays: DataFrame | None = None,
                              _sets: DataFrame | None = None
                              ) -> DataFrame:
    """(src, dst, containment) directed pairs between a new batch and
    the indexed corpus, same schema and semantics as
    containment_pairs_blocked: both passing directions emit, src is
    the contained side. Candidates need ``min_shared`` shared
    winnowed fingerprints (manifest-pinned, like the radius of the
    fp index); index-side stop fingerprints past ``max_df`` are
    excluded BEFORE the join; rows owned by the probing document
    itself never pair (self-exclusion — the replay discipline).
    The confirm joins the candidate-bounded pair list against the
    stored index shingle sets and the batch's own, then one in-row
    array_intersect per pair — nothing corpus-quadratic."""
    from .dedup import _persisted, shingle_sets

    spark = new_docs.sparkSession
    m = _read_cont_manifest(spark, path)
    t = float(threshold)

    probe = _batch_fps(new_docs, m, id_col, text_col,
                       _arrays=_arrays).select(
        F.col(id_col).alias("new_id"), "fp"
    )
    hot = cont_index_hot_fps(spark, path)
    probe = probe.join(F.broadcast(hot), "fp", "left_anti")
    idx = _read_fps(spark, path, m).select(
        F.col("fp"), F.col(id_col).alias("idx_id")
    )
    cands = (
        probe.join(idx, "fp")
        .where(F.col("new_id") != F.col("idx_id"))
        .groupBy("new_id", "idx_id")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= m.min_shared)
        .select("new_id", "idx_id")
    )

    base_sets = (
        _sets.join(
            F.broadcast(new_docs.select(id_col).distinct()), id_col,
            "left_semi",
        )
        if _sets is not None
        else _persisted(shingle_sets(new_docs, id_col, text_col, m.n))
    )
    new_sets = base_sets.select(
        F.col(id_col).alias("new_id"), F.col("shs").alias("__shs_n"),
        F.col("sz").alias("sz_n"),
    )
    idx_sets = _read_recovering(spark, _sub(path, "shingles")).select(
        F.col(id_col).alias("idx_id"), F.col("shs").alias("__shs_i"),
        F.col("sz").alias("sz_i"),
    )
    # persisted: the fwd/rev branches union over this frame — without
    # the cache each branch re-runs the propose equi-join and both
    # confirm joins (measured ~2x probe cost, r14). Candidate-bounded.
    inter = _persisted(
        cands.join(new_sets, "new_id").join(idx_sets, "idx_id")
        .select(
            "new_id", "idx_id", "sz_n", "sz_i",
            F.size(F.array_intersect("__shs_n", "__shs_i"))
            .alias("inter"),
        )
    )
    fwd = inter.where(F.col("inter") / F.col("sz_n") >= t).select(
        F.col("new_id").alias("src"), F.col("idx_id").alias("dst"),
        (F.col("inter") / F.col("sz_n")).alias("containment"),
    )
    rev = inter.where(F.col("inter") / F.col("sz_i") >= t).select(
        F.col("idx_id").alias("src"), F.col("new_id").alias("dst"),
        (F.col("inter") / F.col("sz_i")).alias("containment"),
    )
    return fwd.unionByName(rev)


def ingest_containment_batch(docs: DataFrame, path: str,
                             threshold: float,
                             id_col: str = "doc_id",
                             text_col: str = "text"):
    """One ingestion cycle: resolve batch-internal containment (the
    contained side loses; mutual containment keeps the MIN id — the
    every-tier canonical choice), probe survivors against the index,
    reject batch docs contained in indexed docs, append the admitted
    survivors. Returns (admitted_ids, dup_pairs) in the
    fp_index/semdedup ingest shape — dup_pairs carries every passing
    directed pair seen this cycle, including audit-only rows where an
    INDEXED doc is contained in an admitted new one (the new doc has
    novel content; the index holds the canon, so nothing is removed).
    """
    from .dedup import _persisted, shingle_sets
    from .winnowing import containment_pairs_blocked

    spark = docs.sparkSession
    m = _read_cont_manifest(spark, path)
    batch = docs.select(id_col, text_col).localCheckpoint(eager=True)

    # featurize the batch ONCE: the internal-pair stage, the index
    # probe and the append all consume the same winnow arrays and
    # shingle sets (injected via the _arrays/_sets convention) —
    # without this every micro-batch paid the per-char k-gram hashing
    # three times
    arrays = _batch_arrays(batch, m, id_col, text_col)
    sets = _persisted(shingle_sets(batch, id_col, text_col, m.n))

    internal = containment_pairs_blocked(
        batch, threshold, id_col, text_col, m.n, m.k, m.w,
        m.min_shared, m.max_df, _hash_fn(m.hash),
        _arrays=arrays, _sets=sets,
    ).localCheckpoint(eager=True)
    # contained side loses; a mutual pair (both directions emitted)
    # resolves to the min id by dropping the max-id direction
    mutual_losers = (
        internal.alias("a")
        .join(
            internal.alias("b"),
            (F.col("a.src") == F.col("b.dst"))
            & (F.col("a.dst") == F.col("b.src")),
            "left_semi",
        )
        .where(F.col("a.src") < F.col("a.dst"))
        .select(F.col("a.dst").alias(id_col))
    )
    one_way_losers = (
        internal.alias("a")
        .join(
            internal.alias("b"),
            (F.col("a.src") == F.col("b.dst"))
            & (F.col("a.dst") == F.col("b.src")),
            "left_anti",
        )
        .select(F.col("a.src").alias(id_col))
    )
    losers = mutual_losers.unionByName(one_way_losers).distinct()
    survivors = batch.join(losers, id_col, "left_anti")

    idx_hits = containment_against_index(
        survivors, path, threshold, id_col, text_col,
        _arrays=arrays, _sets=sets,
    ).localCheckpoint(eager=True)
    # rejected: survivor contained in an indexed doc (src is a batch
    # id). The reverse rows (an indexed doc contained in the new one)
    # stay in dup_pairs for audit only.
    batch_ids = survivors.select(F.col(id_col).alias("src"))
    rejected = idx_hits.join(
        F.broadcast(batch_ids.distinct()), "src", "left_semi"
    ).select(F.col("src").alias(id_col)).distinct()
    admitted = survivors.join(rejected, id_col, "left_anti") \
        .localCheckpoint(eager=True)

    write_containment_index(
        admitted, path, id_col=id_col, text_col=text_col, append=True,
        _arrays=arrays, _sets=sets,
    )
    dup_pairs = internal.unionByName(idx_hits)
    return admitted.select(id_col), dup_pairs


def compact_containment_index(spark: SparkSession, path: str,
                              target_file_bytes: int = 128 * 1024 * 1024
                              ) -> dict:
    """Small-file hygiene for an append-heavy containment index:
    directory datasets fold through the crash-safe three-step swap,
    the bucketed fps table through the metastore-level
    fswap.swap_table (same bucket spec, one file per bucket —
    ``Bucketed: true`` and the probe-side-only shuffle survive), and
    the df deltas through the associative SUM (every document
    frequency — and therefore the stop-fingerprint set — unchanged).
    Probes bit-identical before/after. Run between ingest cycles or
    via streaming_ingest_containment(compact_every=N). Returns
    {dataset: (files_before, files_after)} for the rewritten
    datasets."""
    from .fswap import (
        TMP_SUFFIX,
        promote_directory,
        recover_directory,
        recover_table,
        swap_table,
    )

    m = _read_cont_manifest(spark, path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out: dict = {}
    if m.fps_table:
        t = m.fps_table
        recover_table(spark, t)
        before = len(spark.table(t).inputFiles())
        # no distinct: appends are id-excluded, rows already unique
        folded = spark.table(t).repartition(m.buckets, "fp")
        swap_table(
            spark, t,
            lambda tmp: (
                folded.write.bucketBy(m.buckets, "fp").sortBy("fp")
                .saveAsTable(tmp)
            ),
        )
        out["fps"] = (before, len(spark.table(t).inputFiles()))
        datasets = ["shingles"]
    else:
        datasets = ["fps", "shingles"]
    for sub in datasets:
        live = _sub(path, sub)
        recover_directory(spark, live)
        src = jvm.org.apache.hadoop.fs.Path(live)
        fs = src.getFileSystem(conf)
        statuses = [
            st for st in fs.listStatus(src)
            if st.getPath().getName().endswith(".parquet")
        ]
        total_bytes = sum(st.getLen() for st in statuses)
        n_files = max(1, -(-total_bytes // target_file_bytes))
        df = spark.read.parquet(live)
        tmp = live.rstrip("/") + TMP_SUFFIX
        df.repartition(int(n_files)).write.mode("overwrite").parquet(tmp)
        promote_directory(spark, live, tmp)
        after = len([
            st for st in fs.listStatus(src)
            if st.getPath().getName().endswith(".parquet")
        ])
        out[sub] = (len(statuses), after)
    live = _sub(path, "fp_stats")
    recover_directory(spark, live)
    folded_stats = spark.read.parquet(live).groupBy("fp").agg(
        F.sum("n").alias("n")
    )
    tmp = live.rstrip("/") + TMP_SUFFIX
    folded_stats.coalesce(1).write.mode("overwrite").parquet(tmp)
    promote_directory(spark, live, tmp)
    return out


_CONT_INDEX_CACHE: dict = {}
_CONT_INDEX_LOCK = __import__("threading").Lock()
_CONT_KEY_LOCKS: dict = {}


def cont_index_for(docs: DataFrame, cache_key: tuple,
                   **layout) -> str:
    """Materialize (once per process per cache_key) a containment
    index for a corpus and return its path — the fp_index_for /
    ivf_index_for scratch-cache amortization (miss path serialized
    per key; a deployment passes an explicit shared path to
    write_containment_index instead of leaning on this)."""
    import os
    import tempfile
    import threading

    path = _CONT_INDEX_CACHE.get(cache_key)
    if path is not None and os.path.isdir(path):
        return path
    with _CONT_INDEX_LOCK:
        key_lock = _CONT_KEY_LOCKS.setdefault(cache_key,
                                              threading.Lock())
    with key_lock:
        path = _CONT_INDEX_CACHE.get(cache_key)
        if path is None or not os.path.isdir(path):
            path = tempfile.mkdtemp(prefix="cont_index_")
            write_containment_index(docs, path, **layout)
            _CONT_INDEX_CACHE[cache_key] = path
        return path


def streaming_ingest_containment(stream_docs: DataFrame, path: str,
                                 checkpoint_dir: str, threshold: float,
                                 n: int = 3, k: int = 12, w: int = 6,
                                 min_shared: int = 2, max_df: int = 50,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 on_admitted=None,
                                 fps_table: str | None = None,
                                 buckets: int = 64,
                                 compact_every: int | None = None):
    """Continuous containment dedup: every micro-batch of the document
    stream is checked against the index (and against itself) and its
    survivors appended — ``readStream ->
    foreachBatch(ingest_containment_batch)``, the containment twin of
    the MinHash/fingerprint/semantic/span streaming loops. Returns
    the started StreamingQuery. Bootstraps an empty index with the
    given layout (and the STREAM's own id type) when ``path`` has
    none.

    Replay safety: probes exclude rows owned by the probing document
    (self-exclusion), so a replayed batch re-derives its admission
    decisions against exactly what its first run saw and re-appends
    idempotently (present ids excluded). ``on_admitted(ids_df,
    batch_id)`` is therefore at-least-once END TO END by
    construction: the replay re-admits the same set and hands it down
    again — downstream stays idempotent keyed on the id (the
    foreachBatch contract). ``compact_every=N`` runs
    compact_containment_index inside foreachBatch (serial
    micro-batches make "never concurrent with an append" hold by
    construction — the in-loop convention every index twin shares)."""
    spark = stream_docs.sparkSession
    try:
        _read_cont_manifest(spark, path)
    except FileNotFoundError:
        empty = local_df(
            spark, [], stream_docs.select(id_col, text_col).schema
        )
        write_containment_index(
            empty, path, n, k, w, min_shared, max_df, id_col,
            text_col, fps_table=fps_table, buckets=buckets,
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from .dedup import release_caches

        if batch_df.isEmpty():
            return
        try:
            admitted, _dups = ingest_containment_batch(
                batch_df.select(id_col, text_col), path, threshold,
                id_col, text_col,
            )
            if on_admitted is not None:
                on_admitted(admitted, batch_id)
            if compact_every is not None and batch_id % compact_every \
                    == (compact_every - 1):
                compact_containment_index(batch_df.sparkSession, path)
        finally:
            # winnow/shingle array stages persist under the dedup
            # cache ledger; a continuous stream must drop them per
            # batch (admitted/dups are localCheckpointed)
            release_caches()

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
