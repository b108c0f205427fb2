"""End-to-end MEDIA curation: triage -> decode -> near-dup canonical
selection, composed from the verified multimodal operators with the
text funnel's first-failing-gate reject contract
(pipelines/curation.py — a row's reject_reason is its FIRST failing
stage, so funnel losses are attributable and the stage outputs
partition the corpus exactly).

Stage order:

    1. unknown_format   header-only triage (multimodal/containers.py:
                        probe_media) cannot identify the payload —
                        the cheapest possible reject, no decode
    2. unsupported_modality  the row's modality has no curation tier
                        here (e.g. video: the env has no H.264
                        decoder — multimodal/containers.py walks MP4
                        metadata but frames stay opaque)
    3. undecodable      the modality tier's REAL decoder produced no
                        fingerprint: corrupt payload past the header
                        (truncated GIF, damaged IDAT), an image format
                        branch the codec honestly refuses
                        (progressive JPEG), or audio with nothing to
                        fingerprint (pure silence, sub-50 ms blips)
    4. near_dup         perceptual near-dup clusters per modality
                        (dHash / spectral fingerprint ->
                        fingerprint_pairs -> connected components);
                        every non-canonical (non-min-id) member of a
                        cluster is rejected

Scale shape: stage 1 is one header-only mapInPandas pass (bytes never
shuffle); stages 3-4 decode each surviving payload EXACTLY ONCE (a
row routes to one modality tier) into a 64-bit fingerprint, and only
the tiny (media_id, fp) tables — persisted, they feed both the
undecodable anti-join and the pair join — ever shuffle. The pair
joins are the capped pigeonhole equi-joins of operators/dedup.py
(never all-pairs; hot buckets quarantined under ``max_bucket`` with
the ledger returned for audit). The raw binary column stays columnar
in the source scan and is read, not persisted.

No counterpart in the reference (text/numbers only); the composition
mirrors pipelines/curation.py:curation_rejects.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from ..multimodal.containers import probe_media
from ..multimodal.neardup import (
    audio_fingerprint,
    perceptual_hash,
    video_fingerprint_from_frames,
)
from ..operators.components import connected_components
from ..operators.dedup import (
    _CAP_DEFAULT,
    _CapDefault,
    _persisted,
    _resolve_cap,
    fingerprint_hot_buckets,
    fingerprint_pairs,
)

REJECT_ORDER = (
    "unknown_format", "unsupported_modality", "undecodable", "near_dup"
)

# Header-identified container formats -> modality. 'synm' (the
# synthetic test container) carries its own kind byte, so its rows
# route by the corpus's kind column like everything else; the decode
# dispatcher enforces the actual kind at fingerprint time.
_IMAGE_FORMATS = ("png", "jpeg", "jpeg-progressive", "gif", "bmp", "webp",
                  "synm")
_AUDIO_FORMATS = ("wav", "aiff", "mp3", "synm")
_VIDEO_FORMATS = ("mp4", "synm")


@dataclass(frozen=True)
class MediaCurationConfig:
    modalities: tuple[str, ...] = ("image", "audio")
    image_max_hamming: int = 6
    image_method: str = "dhash"
    audio_max_hamming: int = 6
    video_max_hamming: int = 8
    # Shared hot-bucket cap for both modalities' pair joins (the
    # flat-image / re-uploaded-ringtone template case) — defaults to
    # operators/dedup.py DEFAULT_MAX_BUCKET like every pair entry point.
    max_bucket: "int | None | _CapDefault" = _CAP_DEFAULT


def media_curation_rejects(media: DataFrame,
                           cfg: MediaCurationConfig = MediaCurationConfig(),
                           with_quarantine: bool = False,
                           frames: DataFrame | None = None):
    """(media_id, reject_reason) for every rejected media row — first
    failing gate only; rows absent from the result survive curation.

    ``frames`` (optional): a demuxed frame gallery in FRAMES_SCHEMA
    (media_id, frame_idx, frame) enabling the VIDEO tier — add
    "video" to ``cfg.modalities`` and supply the demuxer's output (in
    this environment the real-MP4 demux is the documented stub, so
    frames come from an external demux step; the tier itself — decode,
    majority-vote fingerprint, capped pair join — is real). A video in
    ``frames`` whose frames all fail to decode routes 'undecodable';
    a video-modality row with no frames at all likewise.

    ``with_quarantine=True`` returns ``(rejects, quarantine)`` where
    quarantine is the union of both modalities' fingerprint hot-bucket
    ledgers ((modality, chunk_idx, chunk, n_docs)) excluded under
    ``cfg.max_bucket`` — derived from the SAME persisted fingerprint
    tables the pair joins used, so ledger and join always agree.
    Quarantined rows are ADMITTED (their near-dups in those buckets go
    undetected): the funnel reports the recall loss instead of hiding
    it in a silent drop. None when the cap is disabled."""
    ids = media.select("media_id", "kind")

    # stage 1: header triage — the only pass that touches every byte
    # column row, and it reads headers only
    probed = probe_media(media).select("media_id", "format")
    unknown = probed.where(F.col("format") == "unknown").select(
        "media_id", F.lit("unknown_format").alias("reject_reason")
    )
    s1 = ids.join(unknown.select("media_id"), "media_id", "left_anti")

    # stage 2: modality routing by the corpus's kind column, cross-
    # checked against the probed container family (an 'image' row in a
    # WAV container is unsupported for the image tier, not corrupt)
    fam = (
        F.when(F.col("format").isin(*_IMAGE_FORMATS)
               & F.col("kind").eqNullSafe("image"), "image")
        .when(F.col("format").isin(*_AUDIO_FORMATS)
              & F.col("kind").eqNullSafe("audio"), "audio")
        .when(F.col("format").isin(*_VIDEO_FORMATS)
              & F.col("kind").eqNullSafe("video"), "video")
        .otherwise("other")
    )
    routed = s1.join(probed, "media_id").select(
        "media_id", fam.alias("modality")
    )
    unsupported = routed.where(
        ~F.col("modality").isin(*cfg.modalities)
    ).select(
        "media_id", F.lit("unsupported_modality").alias("reject_reason")
    )
    s2 = routed.where(F.col("modality").isin(*cfg.modalities))

    # stages 3-4 per modality: fingerprint once (persisted — feeds the
    # undecodable anti-join AND the pair join), cluster, keep min-id
    rejects = unknown.unionByName(unsupported)
    quarantines: list[DataFrame] = []
    tiers = {
        "image": (lambda m: perceptual_hash(m, cfg.image_method),
                  "phash", cfg.image_max_hamming),
        "audio": (audio_fingerprint, "afp", cfg.audio_max_hamming),
    }
    if frames is not None:
        # the video tier fingerprints the DEMUXED frames table, not
        # the container bytes — joined down to this funnel's members
        tiers["video"] = (
            lambda m: video_fingerprint_from_frames(
                frames.join(m.select("media_id"), "media_id", "left_semi")
            ),
            "vfp", cfg.video_max_hamming,
        )
    for modality in cfg.modalities:
        if modality == "video" and frames is None:
            raise ValueError(
                "modalities includes 'video' but no demuxed frames "
                "table was supplied — pass frames= (FRAMES_SCHEMA)"
            )
        fp_fn, fp_col, radius = tiers[modality]
        members = s2.where(F.col("modality") == modality).select("media_id")
        rows = media.join(members, "media_id", "left_semi")
        fps = _persisted(fp_fn(rows))
        undecodable = members.join(fps, "media_id", "left_anti").select(
            "media_id", F.lit("undecodable").alias("reject_reason")
        )
        pairs = fingerprint_pairs(
            fps, radius, id_col="media_id", fp_col=fp_col,
            max_bucket=cfg.max_bucket,
        )
        comp = connected_components(pairs)
        near_losers = comp.where(F.col("node") != F.col("cluster_id")).select(
            F.col("node").alias("media_id"),
            F.lit("near_dup").alias("reject_reason"),
        )
        rejects = rejects.unionByName(undecodable).unionByName(near_losers)
        if with_quarantine and cfg.max_bucket is not None:
            quarantines.append(
                fingerprint_hot_buckets(
                    fps, radius, max_bucket=cfg.max_bucket,
                    id_col="media_id", fp_col=fp_col,
                ).select(F.lit(modality).alias("modality"), "*")
            )

    if not with_quarantine:
        return rejects
    quarantine = None
    if quarantines:
        q = quarantines[0]
        for extra in quarantines[1:]:
            q = q.unionByName(extra)
        quarantine = q
    return rejects, quarantine


def curate_media(media: DataFrame,
                 cfg: MediaCurationConfig = MediaCurationConfig(),
                 frames: DataFrame | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """Run the media funnel. Returns (curated, stats): curated is the
    surviving rows (full payload columns), stats the per-stage ledger
    ((stage, n) with 'kept' first) in REJECT_ORDER — the same funnel
    accounting shape as pipelines/curation.py:curate."""
    rejects = media_curation_rejects(media, cfg, frames=frames)
    curated = media.join(rejects.select("media_id"), "media_id", "left_anti")
    order = {name: i for i, name in enumerate(REJECT_ORDER, start=1)}
    order_expr = F.create_map(
        *[x for name, i in order.items() for x in (F.lit(name), F.lit(i))]
    )
    stats = (
        curated.select(F.lit("kept").alias("stage"))
        .unionByName(rejects.select(F.col("reject_reason").alias("stage")))
        .groupBy("stage").agg(F.count("*").alias("n"))
        .orderBy(F.coalesce(order_expr[F.col("stage")], F.lit(0)))
    )
    return curated, stats


INGEST_REJECT_ORDER = REJECT_ORDER + ("corpus_dup",)


def ingest_media_batch(media: DataFrame, index_path: str,
                       cfg: MediaCurationConfig = MediaCurationConfig(),
                       frames: DataFrame | None = None):
    """One cycle of INCREMENTAL media curation: run the batch through
    the full funnel (triage -> decode -> batch-internal near-dup),
    then check the survivors' fingerprints against the PERSISTENT
    per-modality fingerprint indexes of everything previously kept
    (operators/fp_index.py under ``index_path/<modality>``), reject
    collisions as ``corpus_dup`` (the batch funnel's first-failing-
    gate order extends by one final gate), and append the admitted
    fingerprints so the NEXT batch is checked against them too.

    Returns (rejects, admitted): rejects is (media_id, reject_reason)
    over INGEST_REJECT_ORDER; admitted the surviving ids.

    Replay safety follows the fp-index contract THREE times over: a
    replayed batch's fingerprints collide with their first copies at
    Hamming 0 (-> corpus_dup), ids already present in the index are
    corpus_dup by IDENTITY even when their fingerprint bucket is
    quarantined past the cap (the probe can't see a quarantined
    Hamming-0 collision — a replayed flat-template batch would
    otherwise re-report its rows as admitted; caught on the
    1e5-image corpus, BASELINE.md r10), and the index append itself
    excludes already-present ids — so a crash-replay converges to the
    same kept set, reports nothing re-admitted, and the index never
    duplicates. Bootstraps empty indexes on first use."""
    from ..operators.fp_index import (
        dedup_fingerprints_against_index,
        write_fingerprint_index,
        _read_chunks,
        _read_fp_manifest,
    )

    spark = media.sparkSession
    tiers = {
        "image": (lambda m: perceptual_hash(m, cfg.image_method),
                  "phash", cfg.image_max_hamming),
        "audio": (audio_fingerprint, "afp", cfg.audio_max_hamming),
    }
    if frames is not None:
        tiers["video"] = (
            lambda m: video_fingerprint_from_frames(
                frames.join(m.select("media_id"), "media_id", "left_semi")
            ),
            "vfp", cfg.video_max_hamming,
        )
    rejects = media_curation_rejects(media, cfg, frames=frames)
    survivors = media.join(
        rejects.select("media_id"), "media_id", "left_anti"
    ).localCheckpoint(eager=True)

    # resolve the sentinel exactly like every pair entry point does
    # (DEFAULT_MAX_BUCKET unless the caller opted out explicitly), so
    # the PERSISTENT index probes keep the same hot-bucket quarantine
    # the batch-internal joins get — an uncapped index would let one
    # pathological flat-image/template bucket push the incremental
    # probe toward all-pairs at exactly the scale the cap exists for
    # (r7 ADVICE).
    cap = _resolve_cap(cfg.max_bucket)
    admitted_parts = []
    for modality in cfg.modalities:
        fp_fn, fp_col, radius = tiers[modality]
        path = index_path.rstrip("/") + "/" + modality
        # the survivors of OTHER modalities produce no fingerprint row
        # here (wrong-kind payloads decode to nothing), so one pass
        # per modality over the survivor set is already tier-routed
        fps = fp_fn(survivors).localCheckpoint(eager=True)
        try:
            m = _read_fp_manifest(spark, path)
        except FileNotFoundError:
            write_fingerprint_index(
                local_df(spark, [], fps.schema), path,
                max_hamming=radius, id_col="media_id", fp_col=fp_col,
                max_bucket=cap,
            )
            m = _read_fp_manifest(spark, path)
        hits = dedup_fingerprints_against_index(
            fps, path, id_col="media_id"
        ).select(
            F.col("new_id").alias("media_id"),
            F.lit("corpus_dup").alias("reject_reason"),
        )
        # a replayed row (same media_id ALREADY in the index) is a
        # corpus_dup by IDENTITY, independent of the hot-bucket cap: a
        # quarantined bucket hides its Hamming-0 collision from the
        # probe (documented recall loss), but re-reporting the row as
        # newly admitted would hand it downstream twice — measured on
        # the 1e5-image corpus's flat-template replay (BASELINE.md
        # r10). The presence read mirrors write_fingerprint_index's
        # own append exclusion (id column only, batch ids broadcast),
        # and goes through the tier- and recovery-aware _read_chunks
        # (metastore tier reads the table; a stranded mid-compaction
        # swap is healed in-line) — a raw parquet read here would
        # silently skip the check on the metastore tier and swallow
        # genuine read failures as "first batch" (r10 ADVICE). The
        # bootstrap write above guarantees the dataset exists, so any
        # failure from here is a real error and raises.
        idx_ids = _read_chunks(spark, path, m).select(
            F.col("id").alias("media_id")
        )
        replayed = idx_ids.join(
            F.broadcast(fps.select("media_id").distinct()),
            "media_id", "left_semi",
        ).withColumn("reject_reason", F.lit("corpus_dup"))
        hits = hits.unionByName(replayed)
        hits = hits.distinct().localCheckpoint(eager=True)
        rejects = rejects.unionByName(hits)
        admitted_fps = fps.join(hits.select("media_id"), "media_id",
                                "left_anti").localCheckpoint(eager=True)
        write_fingerprint_index(admitted_fps, path, append=True)
        admitted_parts.append(admitted_fps.select("media_id"))

    admitted = admitted_parts[0]
    for extra in admitted_parts[1:]:
        admitted = admitted.unionByName(extra)
    return rejects, admitted
