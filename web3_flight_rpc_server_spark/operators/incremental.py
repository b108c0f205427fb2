"""Incremental near-dup detection against a persisted MinHash index.

The one-shot pipeline (operators/dedup.py:minhash_lsh_dedup_pairs)
re-signatures the WHOLE corpus every run. At 100 TB that is the wrong
shape for the workload that actually occurs: a corpus snapshot is
already curated, and each day a new batch (orders of magnitude
smaller) must be checked against it — and against itself — before
being appended. This module persists the three artifacts that make
that incremental:

- ``bands/``    (doc_id, band, bucket): banded LSH signatures — the
                probe side of candidate generation. The bucket values
                come from operators/dedup.py:banded_signatures, the
                SAME derivation the one-shot pipeline uses, so an
                indexed corpus and a fresh batch always collide in
                identical buckets.
- ``shingles/`` (doc_id, shs, sz): distinct shingle arrays — exact
                Jaccard verification of candidates without re-reading
                or re-tokenizing the corpus text.
- ``manifest/`` one row (num_hashes, bands, n): the layout the index
                was built with. Probes ALWAYS band with the manifest's
                parameters — a probe banded differently would simply
                never collide and silently admit duplicates, so the
                layout is recorded with the data, not re-guessed per
                call; appends validate against it and refuse a
                mismatch.
- ``bucket_stats/`` (band, bucket, n) per-append population deltas —
                maintained when the manifest records a ``max_bucket``
                cap. Folding them (sum per bucket) gives the
                population of every band bucket WITHOUT rescanning the
                bands dataset; buckets past the cap are quarantined
                out of the probe join (the operators/dedup.py
                hot-bucket cap applied to the persistent tier: an
                indexed template bucket of m docs costs every future
                probe O(m) candidates forever, so the index is where
                the cap matters most). Deltas are computed AFTER the
                idempotent-append exclusion, so crash-replayed appends
                do not inflate counts — but the bands append and the
                stats-delta append are two writes, and a crash BETWEEN
                them loses that delta permanently (the replay's
                exclusion removes the already-present ids before the
                delta recomputes), leaving the folded populations an
                UNDERCOUNT until repaired: the stats are a cheap
                conservative view, not a ledger of record. Detect with
                :func:`verify_bucket_stats` and repair with
                :func:`rebuild_bucket_stats` (one bands scan,
                crash-safe swap) after any crash-replay. Audit with
                :func:`index_hot_buckets`.

All three are written and read through Spark, so the index path may
live on any Hadoop-visible filesystem (local, HDFS, s3a), not just the
driver's local disk.

Scale shape: checking a batch of b docs against an index of N docs
costs signatures over b docs plus ONE equi-join of b x bands probe
rows against the bands dataset keyed on (band, bucket) — never a
rescan of the N-doc text, never all-pairs. Two storage tiers for the
bands dataset, chosen at first write and recorded in the manifest:
plain parquet (default — the index stays a portable directory, no
metastore needed) or a metastore table bucketed on (band, bucket)
(``bands_table=``, sources/bucketed.py's lever), whose pinned hash
partitioning makes the probe join shuffle ONLY the probe side — no
Exchange over the index no matter how large the corpus grows
(plan-asserted in tests/test_incremental.py). Verification then joins
the (small) candidate set to both shingle tables in-row
(array_intersect) — AQE broadcasts it at runtime.

No counterpart in the reference (its only dedup surface is the
``removed`` passthrough, Converter.java:169); this is north-star C11
taken to its production ingestion shape.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..functions.localdf import local_df

from .dedup import (
    _persisted,
    _verify_pairs,
    agg_signatures,
    banded_signatures,
    shingle_sets,
)

DEFAULT_NUM_HASHES = 32
DEFAULT_BANDS = 8
DEFAULT_SHINGLE_N = 3


def _sub(path: str, name: str) -> str:
    return path.rstrip("/") + "/" + name


@dataclass(frozen=True)
class IndexManifest:
    """The layout an index was built with — recorded with the data so
    probes and appends can never band differently (a mismatched probe
    would simply never collide and silently admit duplicates)."""
    num_hashes: int
    bands: int
    n: int
    # metastore bucketed-bands tier: when set, the bands dataset lives
    # in this bucketed table (CLUSTERED BY (band, bucket)) instead of
    # plain parquet under path/bands — the probe join then shuffles
    # ONLY the probe side; the index side reads co-located buckets
    bands_table: str | None = None
    buckets: int = 0
    # hot-bucket quarantine cap: band buckets whose indexed population
    # exceeds this are excluded from probe joins (None = uncapped).
    # Recorded with the layout because the cap is a recall contract:
    # probes against the same index must agree on what is quarantined.
    max_bucket: int | None = None

    @property
    def layout(self) -> tuple[int, int, int]:
        return (self.num_hashes, self.bands, self.n)


def _read_recovering(spark: SparkSession, live: str) -> DataFrame:
    """Read a compactable dataset directory, self-healing a half-done
    compaction swap (operators/fswap.py) if the live dir is missing —
    probes keep working across a compaction crash instead of failing
    until manual repair."""
    try:
        return spark.read.parquet(live)
    except AnalysisException:
        from .fswap import recover_directory

        # "live" counts too: a concurrent promote may have completed
        # the swap between our failed listing and the recovery call —
        # the dataset is whole again, retry the read (r6 drill). The
        # refresh drops Spark's cached file listing for the path,
        # which otherwise still names the pre-swap files.
        if recover_directory(spark, live) in (
            "promoted", "rolled_back", "live"
        ):
            spark.catalog.refreshByPath(live)
            return spark.read.parquet(live)
        # "missing" can itself be a race artifact: live was absent at
        # recover's FIRST check, then a completing promote renamed
        # tmp->live and deleted .old before recover's tmp/.old checks —
        # the dataset is whole yet recover saw nothing at any name.
        # Re-check the live path before declaring the dataset gone
        # (r6 ADVICE, operators/fswap.py entry-race twin). Require the
        # _SUCCESS marker like every other fswap path: the race this
        # targets (a completed promote) only ever renames COMPLETE
        # tmps into place, so live-without-_SUCCESS here is a plain
        # mode("overwrite") mid-write — reading it would return
        # partial data (r7 ADVICE).
        from .fswap import _hadoop, _success_marker

        fs, jvm, live_p = _hadoop(spark, live)
        if fs.exists(live_p) and _success_marker(fs, jvm, live):
            spark.catalog.refreshByPath(live)
            return spark.read.parquet(live)
        raise


def _read_manifest(spark: SparkSession, path: str) -> IndexManifest:
    """Layout of the index at ``path``; raises FileNotFoundError if
    there is no index there. Pre-bucketed-tier manifests (no
    bands_table column) read as the plain-parquet layout."""
    try:
        row = spark.read.parquet(_sub(path, "manifest")).collect()[0]
    except AnalysisException as exc:
        raise FileNotFoundError(
            f"no MinHash index at {path!r} — write the first corpus "
            "snapshot with write_minhash_index() before probing it"
        ) from exc
    d = row.asDict()
    mb = d.get("max_bucket")
    return IndexManifest(
        int(row.num_hashes), int(row.bands), int(row.n),
        d.get("bands_table"), int(d.get("buckets") or 0),
        int(mb) if mb is not None else None,
    )


def write_minhash_index(docs: DataFrame, path: str,
                        num_hashes: int = DEFAULT_NUM_HASHES,
                        bands: int = DEFAULT_BANDS,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = DEFAULT_SHINGLE_N, append: bool = False,
                        bands_table: str | None = None,
                        buckets: int = 64,
                        max_bucket: int | None = None,
                        _sets: DataFrame | None = None) -> None:
    """Write (or append a new batch to) the MinHash index at ``path``.

    ``append=True`` is the ingestion loop: after a batch passes
    :func:`dedup_against_index`, index its survivors so the NEXT batch
    is checked against them too. Appends are partition-additive
    writes — no rewrite of existing index files — and must use
    the layout recorded in the manifest (validated; ValueError on
    mismatch). The caller owns id uniqueness across appends
    (deterministic doc ids, e.g. content-hash-derived, make replays
    idempotent).

    ``bands_table`` selects the metastore tier for the bands dataset:
    a bucketed table CLUSTERED BY (band, bucket) INTO ``buckets``
    buckets (sources/bucketed.py's lever applied to the index). Probe
    joins against a bucketed bands side shuffle ONLY the probe — the
    index side's hash partitioning is pinned in the table layout, so
    the plan carries no Exchange over it no matter how large the
    indexed corpus grows. The plain-parquet default keeps the index a
    portable directory (no metastore needed); the layout choice is
    recorded in the manifest and appends/probes follow it
    automatically.

    ``max_bucket`` engages the persistent hot-bucket quarantine:
    per-append (band, bucket) population deltas are maintained under
    ``bucket_stats/`` (computed AFTER the idempotent-append exclusion,
    so replays don't inflate them), and probes exclude buckets whose
    folded population exceeds the cap — bounding probe cost against a
    template-heavy indexed corpus the same way the one-shot tier's
    ``max_bucket`` bounds its self-join (operators/dedup.py). Like the
    banding layout, the cap is manifest-recorded: appends inherit it
    and cannot change it mid-index. The bands append and the stats
    append are not atomic — a crash between them leaves the folded
    stats undercounting that batch forever (see the module doc); after
    any crash-replay, run :func:`verify_bucket_stats` /
    :func:`rebuild_bucket_stats` to detect/repair."""
    spark = docs.sparkSession
    if append:
        m = _read_manifest(spark, path)
        if (num_hashes, bands, n) != m.layout:
            raise ValueError(
                f"index at {path!r} was built with (num_hashes, bands, n)="
                f"{m.layout}; append requested "
                f"{(num_hashes, bands, n)} — rebanding an existing index "
                "silently breaks collisions, rebuild instead"
            )
        # layout (incl. the bands storage tier and the quarantine cap)
        # comes from the manifest on append — a caller cannot switch
        # tiers or caps mid-index
        bands_table, buckets, max_bucket = (
            m.bands_table, m.buckets, m.max_bucket
        )
    mode = "append" if append else "overwrite"

    def _write_bands(df: DataFrame, write_mode: str) -> None:
        if bands_table:
            from .fswap import recover_table

            recover_table(spark, bands_table)
            # repartition by the bucket expression (same murmur3 pmod
            # as bucketBy) so each task holds exactly one bucket: at
            # most one file per non-empty bucket per append instead of
            # one per (task, bucket) pair (the span tier's discipline)
            (
                df.repartition(buckets, "band", "bucket")
                .write.mode(write_mode)
                .bucketBy(buckets, "band", "bucket")
                .sortBy("band", "bucket")
                .saveAsTable(bands_table)
            )
        else:
            df.write.mode(write_mode).parquet(_sub(path, "bands"))

    def _read_bands_existing() -> DataFrame:
        if bands_table:
            from .fswap import recover_table

            recover_table(spark, bands_table)
            return spark.table(bands_table)
        return spark.read.parquet(_sub(path, "bands"))

    sets = _sets if _sets is not None else _persisted(
        shingle_sets(docs, id_col, text_col, n)
    )
    sigs = agg_signatures(sets, num_hashes, id_col)
    banded = banded_signatures(sigs, bands, id_col)
    if max_bucket is not None:
        # the banded rows feed BOTH the dataset write and the
        # bucket_stats delta; cut the lineage so the stats aggregation
        # doesn't re-run the signature job (and, on append, doesn't
        # hold a plan over the path being appended to)
        banded = banded.localCheckpoint(eager=True)

    def _write_stats(banded_written: DataFrame, write_mode: str) -> None:
        if max_bucket is None:
            return
        banded_written.groupBy("band", "bucket").agg(
            F.count("*").alias("n")
        ).write.mode(write_mode).parquet(_sub(path, "bucket_stats"))

    if append:
        # Idempotent append: the two dataset writes are not atomic, so
        # a crash between them leaves a doc half-indexed and the
        # replayed batch re-admits it (its probe can't verify against
        # a missing shingle row). Excluding ids ALREADY PRESENT in
        # each dataset makes the replay complete the missing half
        # without duplicating the other — the index never gains
        # duplicate entries even across crash-replay. The presence
        # probe is a broadcast semi-join of the (small) batch ids
        # against the id column only; the result stays a DataFrame
        # (a genuine full-batch replay after a crash can be huge — a
        # driver collect + IN-list literal would not survive it) and
        # is localCheckpointed so the exclusion anti-join below does
        # NOT keep a live plan over the very path being appended to.
        batch_ids = F.broadcast(sets.select(id_col).distinct())
        # self-heal any half-done compaction swap BEFORE appending: an
        # append recreating a missing live dir would strand the real
        # history under the swap's .old name (operators/fswap.py)
        from .fswap import recover_directory

        subs = ["shingles"] if bands_table else ["bands", "shingles"]
        if max_bucket is not None:
            subs.append("bucket_stats")
        for sub in subs:
            recover_directory(spark, _sub(path, sub))
        for sub, df_out in (("bands", banded), ("shingles", sets)):
            try:
                existing = (
                    _read_bands_existing() if sub == "bands"
                    else spark.read.parquet(_sub(path, sub))
                )
                present = (
                    existing.select(id_col)
                    .join(batch_ids, id_col, "left_semi")
                    .distinct()
                    .localCheckpoint(eager=True)
                )
            except AnalysisException:
                present = None  # dataset missing entirely
            if present is not None and not present.isEmpty():
                df_out = df_out.join(
                    F.broadcast(present), id_col, "left_anti"
                )
            if sub == "bands":
                _write_bands(df_out, mode)
                _write_stats(df_out, "append")
            else:
                df_out.write.mode(mode).parquet(_sub(path, sub))
    else:
        _write_bands(banded, mode)
        _write_stats(banded, "overwrite")
        sets.write.mode(mode).parquet(_sub(path, "shingles"))
    if not append:
        local_df(
            spark,
            [(num_hashes, bands, n, bands_table,
              buckets if bands_table else 0, max_bucket)],
            "num_hashes int, bands int, n int, "
            "bands_table string, buckets int, max_bucket int",
        ).write.mode("overwrite").parquet(_sub(path, "manifest"))


def index_bucket_populations(spark: SparkSession, path: str) -> DataFrame:
    """Exact (band, bucket, n_docs) population of every indexed band
    bucket, folded from the per-append deltas — no scan of the bands
    dataset. Only available when the index was built with
    ``max_bucket``."""
    stats = _read_recovering(spark, _sub(path, "bucket_stats"))
    return stats.groupBy("band", "bucket").agg(
        F.sum("n").alias("n_docs")
    )


def index_hot_buckets(spark: SparkSession, path: str) -> DataFrame:
    """The quarantine ledger of the persistent index: buckets whose
    population exceeds the manifest's ``max_bucket``. These are
    excluded from every probe join — auditing them is how an operator
    decides whether the corpus needs a template-strip pass."""
    m = _read_manifest(spark, path)
    if m.max_bucket is None:
        raise ValueError(
            f"index at {path!r} was built without max_bucket; no "
            "bucket_stats are maintained"
        )
    return index_bucket_populations(spark, path).where(
        F.col("n_docs") > m.max_bucket
    )


def _read_bands(spark: SparkSession, path: str,
                m: IndexManifest) -> DataFrame:
    """The bands dataset regardless of storage tier (bucketed table or
    plain parquet), self-healing a half-done compaction swap — for the
    metastore tier that means completing a torn swap_table rename."""
    if m.bands_table:
        from .fswap import recover_table

        recover_table(spark, m.bands_table)
        return spark.table(m.bands_table)
    return _read_recovering(spark, _sub(path, "bands"))


def verify_bucket_stats(spark: SparkSession, path: str) -> bool:
    """True iff the folded ``bucket_stats/`` total equals the bands
    dataset's row count. The only way the two drift under the
    single-writer contract is the non-atomic append crash window (a
    bands delta landed, its stats delta didn't — see the module doc),
    and that failure always changes the TOTAL, so this total check
    detects it with one zero-column bands scan plus the (small) stats
    fold — no per-bucket join. Run it after a crash-replay; if False,
    :func:`rebuild_bucket_stats` repairs."""
    m = _read_manifest(spark, path)
    if m.max_bucket is None:
        raise ValueError(
            f"index at {path!r} was built without max_bucket; no "
            "bucket_stats are maintained"
        )
    folded = (
        _read_recovering(spark, _sub(path, "bucket_stats"))
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("t")).collect()[0].t
    )
    return int(folded) == _read_bands(spark, path, m).count()


def rebuild_bucket_stats(spark: SparkSession, path: str) -> None:
    """Recompute ``bucket_stats/`` exactly from the bands dataset —
    the repair for the append crash window (and an idempotent way to
    compact the per-append deltas into one file set). One scan of the
    bands dataset; the swap is the crash-safe fswap promote, so a
    crash mid-rebuild leaves the previous stats readable."""
    m = _read_manifest(spark, path)
    if m.max_bucket is None:
        raise ValueError(
            f"index at {path!r} was built without max_bucket; no "
            "bucket_stats are maintained"
        )
    from .fswap import TMP_SUFFIX, promote_directory, recover_directory

    live = _sub(path, "bucket_stats")
    recover_directory(spark, live)
    (
        _read_bands(spark, path, m)
        .groupBy("band", "bucket").agg(F.count("*").alias("n"))
        .write.mode("overwrite").parquet(live + TMP_SUFFIX)
    )
    promote_directory(spark, live)


def dedup_against_index(new_docs: DataFrame, path: str,
                        threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        _sets: DataFrame | None = None,
                        _banded: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs between a new batch and the indexed corpus.

    Banding parameters come from the index manifest — a probe banded
    differently from the index would never collide, so they are not
    caller-suppliable. Output (new_id, idx_id, jaccard) with
    jaccard >= threshold — exact-verified, so precision is 1 by
    construction; recall is the banding recall of the underlying LSH
    (identical to the one-shot pipeline's, because signatures and
    buckets are derived by the same functions). Batch-internal
    duplicates are NOT reported here — ingest_batch resolves those
    from the same artifacts."""
    spark = new_docs.sparkSession
    m = _read_manifest(spark, path)
    num_hashes, bands, n = m.layout
    new_sets = _sets if _sets is not None else _persisted(
        shingle_sets(new_docs, id_col, text_col, n)
    )
    new_banded = _banded if _banded is not None else banded_signatures(
        agg_signatures(new_sets, num_hashes, id_col), bands, id_col
    )

    # bucketed tier: the table scan's pinned (band, bucket) hash
    # partitioning satisfies the join's distribution requirement, so
    # only the (tiny) probe side shuffles — asserted in
    # tests/test_incremental.py
    idx_bands = _read_bands(spark, path, m)
    probe = new_banded.select(
        F.col(id_col).alias("new_id"), "band", "bucket"
    )
    if m.max_bucket is not None:
        # quarantine: drop probe rows landing in over-cap index
        # buckets BEFORE the join — a template bucket of m docs costs
        # O(m) candidates per colliding probe doc forever. The hot set
        # holds only pathological buckets, so it broadcasts. A probe
        # doc can still match through any non-hot band (graceful
        # recall, same contract as the one-shot tier); audit what is
        # excluded with index_hot_buckets().
        hot = index_hot_buckets(spark, path).select("band", "bucket")
        probe = probe.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    cands = (
        probe.join(
            idx_bands.select(
                F.col(id_col).alias("idx_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .select("new_id", "idx_id")
        .distinct()
    )

    idx_sets = _read_recovering(spark, _sub(path, "shingles")).select(
        F.col(id_col).alias("idx_id"),
        F.col("shs").alias("shs_i"),
        F.col("sz").alias("sz_i"),
    )
    batch_sets = new_sets.select(
        F.col(id_col).alias("new_id"),
        F.col("shs").alias("shs_n"),
        F.col("sz").alias("sz_n"),
    )
    inter = F.size(F.array_intersect("shs_n", "shs_i"))
    return (
        cands.join(batch_sets, "new_id")
        .join(idx_sets, "idx_id")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_n") + F.col("sz_i") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "idx_id", "jaccard")
    )


def ingest_batch(new_docs: DataFrame, path: str,
                 threshold: float = 0.5,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One step of the incremental ingestion loop: report the batch's
    near-dups against the index, append only the NON-duplicate batch
    docs to it, and return the kept docs. Batch-internal near-dups are
    resolved first (smallest id wins per pair) so two copies arriving
    in the same batch cannot both be admitted.

    The batch is featurized ONCE: the persisted shingle sets feed the
    index probe, the batch-internal self-check, and (filtered to the
    survivors) the index append — no re-tokenization per stage."""
    spark = new_docs.sparkSession
    m = _read_manifest(spark, path)
    num_hashes, bands, n = m.layout
    new_sets = _persisted(shingle_sets(new_docs, id_col, text_col, n))
    # persisted: the banded signatures feed BOTH the index probe and
    # the batch-internal self-join — without the persist each consumer
    # re-runs the explode + k-min-aggregate signature job
    new_banded = _persisted(
        banded_signatures(
            agg_signatures(new_sets, num_hashes, id_col), bands, id_col
        )
    )

    vs_index = dedup_against_index(
        new_docs, path, threshold, id_col, text_col,
        _sets=new_sets, _banded=new_banded,
    ).select(F.col("new_id").alias(id_col)).distinct()

    # batch-internal near-dups from the SAME banded signatures: the
    # self-join bucket collision + exact verify is exactly the
    # one-shot pipeline restricted to this batch — including the
    # manifest's hot-bucket cap (a template-heavy BATCH is the same
    # quadratic hazard in miniature)
    from .dedup import _drop_hot_buckets

    internal_banded = _drop_hot_buckets(
        new_banded, ["band", "bucket"], m.max_bucket
    )
    l, r = internal_banded.alias("l"), internal_banded.alias("r")
    internal_cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("d1"), F.col(f"r.{id_col}").alias("d2")
        )
        .distinct()
    )
    internal = _verify_pairs(internal_cands, new_sets, threshold, id_col) \
        .select(F.col("d2").alias(id_col)).distinct()

    kept = (
        new_docs.join(vs_index, id_col, "left_anti")
        .join(internal, id_col, "left_anti")
    )
    # Materialize BEFORE the append — with a LINEAGE CUT, not a mere
    # persist: the kept plan embeds a probe of the index path, and the
    # parquet append triggers refreshByPath, which invalidates any
    # cache entry whose plan reads that path; the lazy recompute would
    # then see the just-admitted docs in the index and anti-join them
    # against themselves (observed: empty result). localCheckpoint
    # severs the plan from the path entirely. (At cluster scale with
    # executor loss in play, use a reliable checkpoint dir instead.)
    kept = kept.localCheckpoint(eager=True)
    kept_sets = new_sets.join(
        kept.select(id_col), id_col, "left_semi"
    )
    write_minhash_index(
        kept, path, num_hashes, bands, id_col, text_col, n,
        append=True, _sets=kept_sets,
    )
    return kept


def streaming_ingest(stream_docs: DataFrame, path: str,
                     checkpoint_dir: str, threshold: float = 0.5,
                     num_hashes: int = DEFAULT_NUM_HASHES,
                     bands: int = DEFAULT_BANDS,
                     n: int = DEFAULT_SHINGLE_N,
                     id_col: str = "doc_id", text_col: str = "text",
                     on_kept=None, bands_table: str | None = None,
                     buckets: int = 64, max_bucket: int | None = None,
                     compact_every: int | None = None):
    """Continuous ingestion: every micro-batch of the document stream
    is deduped against the index (and against itself) and its
    survivors appended — ``readStream -> foreachBatch(ingest_batch)``.
    Returns the started StreamingQuery.

    Bootstraps an empty index (with the given layout) when ``path``
    has none, so the stream can be the corpus's first writer.

    Replay safety: foreachBatch is at-least-once on failure recovery,
    but a replayed append is self-healing — the replayed documents
    probe an index that already contains their first copies, collide
    at Jaccard 1, and are rejected, so the index gains no duplicate
    entries (asserted in tests/test_incremental.py). ``on_kept(df,
    batch_id)`` is the survivors' hand-off to downstream sinks; it
    inherits foreachBatch's at-least-once contract.

    ``compact_every=N`` runs compact_index every N micro-batches,
    INSIDE the foreachBatch callback — micro-batches execute serially,
    so the compaction's "never concurrent with an append" contract
    holds by construction instead of by operator discipline (the same
    opt-in the semantic twin gained in r9:
    operators/semdedup.py:streaming_ingest_embeddings). Compaction is
    layout hygiene (probes bit-identical before/after), so a replayed
    batch re-running it is harmless, and a crash mid-compaction
    self-heals through the fswap recovery on the next
    probe/append/compaction. The trigger is ``batch_id % N == N - 1``
    (batch_id is stable across replays, so the cadence is too).
    Without it a long-running stream appends per-batch small files
    unboundedly — ~20-25% probe tax per 399 fragments measured on the
    semantic tier (BASELINE.md r9)."""
    spark = stream_docs.sparkSession
    try:
        _read_manifest(spark, path)
    except FileNotFoundError:
        # bootstrap with the STREAM's own id/text types — a hardcoded
        # (long, string) schema would poison the index with
        # type-conflicting files for, e.g., content-hash string ids
        empty = local_df(
            spark, [], stream_docs.select(id_col, text_col).schema
        )
        write_minhash_index(
            empty, path, num_hashes, bands, id_col, text_col, n,
            bands_table=bands_table, buckets=buckets,
            max_bucket=max_bucket,
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from .dedup import release_caches

        if batch_df.isEmpty():
            return
        try:
            kept = ingest_batch(
                batch_df.select(id_col, text_col), path, threshold,
                id_col, text_col,
            )
            if on_kept is not None:
                on_kept(kept, batch_id)
            if compact_every is not None and batch_id % compact_every == (
                compact_every - 1
            ):
                compact_index(batch_df.sparkSession, path)
        finally:
            # long-lived host contract (operators/dedup.py): drop the
            # batch's persisted shingle/signature intermediates, or a
            # continuous stream pins one set per micro-batch forever.
            # Safe here: `kept` is localCheckpointed, so nothing
            # returned to on_kept depends on the released caches.
            release_caches()

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_index(spark: SparkSession, path: str,
                  target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Fold the small files a streaming ingest accumulates back into
    few large ones — every micro-batch append adds a file per dataset
    per partition, and a month of 30 s batches is ~90k files whose
    open/footer cost eventually dominates probe scans (the classic
    small-files problem).

    Rewrites the portable-directory datasets (``bands``/``shingles``)
    at ~``target_file_bytes`` per file and promotes each with the
    crash-safe three-step swap (operators/fswap.py): a crash at any
    point leaves a complete dataset under a known name, and the swap
    self-heals on the next compaction/probe/append — no
    delete-then-rename window with the bands/shingles missing. On
    S3-class stores the renames are copy-based — run inside the
    store's commit mechanism, same caveat as
    operators/sketches.py:compact_sketches. Rows, schema and the
    manifest are untouched: compaction is layout hygiene, not a
    semantic operation, so probes before/after are identical
    (pinned in tests/test_incremental.py). With the bucketed
    metastore tier the bands dataset folds through fswap.swap_table:
    appends add <= 1 file per non-empty bucket per batch, so without
    the in-loop fold the table still grows ~buckets files per append
    cumulatively (the exact gap the span soak measured at 2,123
    files/150 batches, r13 VERDICT #1); the fold rewrites into one
    file per bucket with the SAME bucket spec, so ``Bucketed: true``
    and the probe-side-only shuffle survive, and every crash window
    self-heals via recover_table/sweep_tmp_table at the next open.

    Run it BETWEEN ingest cycles, or inside
    streaming_ingest(compact_every=N) where serial micro-batches make
    "never concurrent with an append" hold by construction. Returns
    {dataset: (files_before, files_after)}.
    """
    from .fswap import TMP_SUFFIX, promote_directory, recover_directory
    from .fswap import recover_table, swap_table

    m = _read_manifest(spark, path)
    out_bands = None
    if m.bands_table:
        datasets = ["shingles"]  # bands live in the metastore table
        t = m.bands_table
        recover_table(spark, t)
        before = len(spark.table(t).inputFiles())
        # no distinct: appends are id-excluded, so rows are already
        # unique — pure layout hygiene (verify_bucket_stats counts
        # bands rows, a distinct here could break it)
        folded = spark.table(t).repartition(m.buckets, "band", "bucket")
        swap_table(
            spark, t,
            lambda tmp: (
                folded.write.bucketBy(m.buckets, "band", "bucket")
                .sortBy("band", "bucket")
                .saveAsTable(tmp)
            ),
        )
        out_bands = (before, len(spark.table(t).inputFiles()))
    else:
        datasets = ["bands", "shingles"]
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = {}
    for sub in datasets:
        live = _sub(path, sub)
        recover_directory(spark, live)  # finish any half-done swap
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
    if m.max_bucket is not None:
        # bucket_stats compaction is SEMANTIC but estimate-preserving:
        # folding the per-append deltas to one row per bucket (sum is
        # associative) leaves every population — and therefore the
        # quarantine set — unchanged, the same algebra-backed move as
        # compact_sketches' hll_union fold.
        live = _sub(path, "bucket_stats")
        recover_directory(spark, live)
        folded = spark.read.parquet(live).groupBy("band", "bucket").agg(
            F.sum("n").alias("n")
        )
        tmp = live.rstrip("/") + TMP_SUFFIX
        folded.coalesce(1).write.mode("overwrite").parquet(tmp)
        promote_directory(spark, live, tmp)
    if out_bands is not None:
        out["bands"] = out_bands
    return out
