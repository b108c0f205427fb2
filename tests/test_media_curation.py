"""Media curation funnel (VERDICT r6 ask #4): probe-triage +
fingerprint near-dup canonical selection composed with the text
funnel's first-failing-gate contract, on a mixed corpus — decodable
images with planted mutations, decodable audio with a gain twin,
corrupt payloads, junk, a video row, a lying-kind row.

Every row's routing is asserted individually (the per-doc oracle
style of tests/test_curation.py), plus the partition property: rejects
and survivors are disjoint and cover the corpus exactly once.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from web3_flight_rpc_server_spark.multimodal.media import (
    MEDIA_SCHEMA,
    _png_encode,
)
from web3_flight_rpc_server_spark.pipelines.media_curation import (
    REJECT_ORDER,
    MediaCurationConfig,
    curate_media,
    media_curation_rejects,
)


def _img(seed: int) -> np.ndarray:
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float64)
    img = 128 + 44 * np.sin((0.07 + 0.04 * seed) * xx + 0.7 * seed) \
        + 44 * np.sin((0.11 + 0.03 * seed) * yy + 1.3 * seed)
    gray = np.clip(img, 40, 215).astype(np.uint8)
    return np.repeat(gray[..., None], 3, axis=2)


def _wav(pcm: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _melody(seed: int, rate: int = 8000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    seg = int(rate * 0.2)
    out = []
    for _ in range(9):
        f1, f2 = rng.choice(np.geomspace(150, 3500, 24), 2, replace=False)
        t = np.arange(seg) / rate
        out.append(0.5 * np.sin(2 * np.pi * f1 * t)
                   + 0.3 * np.sin(2 * np.pi * f2 * t))
    return np.concatenate(out)


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _corpus(spark):
    """Every funnel outcome planted, with the expected routing."""
    img0, img1 = _img(0), _img(1)
    bright = np.clip(img0.astype(np.int16) + 25, 0, 255).astype(np.uint8)
    good_png = _png_encode(img0)
    idat = good_png.find(b"IDAT")
    corrupt_png = (good_png[:idat + 4]
                   + bytes(b ^ 0xFF for b in good_png[idat + 4:idat + 12])
                   + good_png[idat + 12:])
    mel = _melody(0)
    # minimal structurally-valid ISO-BMFF tree (ftyp + moov(mvhd +
    # trak(tkhd))) — the same synthesized fixture test_multimodal.py
    # probes with; a bare ftyp box probes as 'unknown'
    mvhd = struct.pack(">B3x", 0) + b"\x00" * 8 + struct.pack(
        ">II", 600, 9000
    ) + b"\x00" * 80
    tkhd = struct.pack(">B3x", 0) + b"\x00" * 72 + struct.pack(
        ">II", 640 << 16, 360 << 16
    )
    moov = _mp4_box(b"mvhd", mvhd) + _mp4_box(
        b"trak", _mp4_box(b"tkhd", tkhd)
    )
    mp4 = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _mp4_box(
        b"moov", moov
    )
    rows = [
        # image near-dup group: 1 keeps, 2 rejected near_dup
        (1, "image", good_png, None),
        (2, "image", _png_encode(bright), None),
        # unrelated image: survives
        (3, "image", _png_encode(img1), None),
        # audio near-dup pair: 10 keeps, 11 rejected
        (10, "audio", _wav(mel), None),
        (11, "audio", _wav(mel * 0.5), None),
        # unrelated audio: survives
        (12, "audio", _wav(_melody(5)), None),
        # corrupt image past the header: probed png, decode fails
        (20, "image", corrupt_png, None),
        # silent audio: decodes but nothing to fingerprint
        (21, "audio", _wav(np.zeros(8000)), None),
        # junk: header triage fails
        (30, "image", b"\x00\x01junk", None),
        # video: no curation tier in this env
        (31, "video", mp4, None),
        # lying kind: an 'image' row holding a WAV container
        (32, "image", _wav(mel), None),
    ]
    expected = {
        2: "near_dup", 11: "near_dup",
        20: "undecodable", 21: "undecodable",
        30: "unknown_format",
        31: "unsupported_modality", 32: "unsupported_modality",
    }
    survivors = {1, 3, 10, 12}
    return spark.createDataFrame(rows, MEDIA_SCHEMA), expected, survivors


def test_per_row_routing_and_partition(spark):
    media, expected, survivors = _corpus(spark)
    rejects = {r.media_id: r.reject_reason
               for r in media_curation_rejects(media).collect()}
    assert rejects == expected
    curated, stats = curate_media(media)
    kept = {r.media_id for r in curated.select("media_id").collect()}
    assert kept == survivors
    # partition: every corpus row routed exactly once
    assert kept | set(rejects) == {r.media_id
                                   for r in media.select("media_id").collect()}
    assert not (kept & set(rejects))
    ledger = {r.stage: r.n for r in stats.collect()}
    assert ledger == {"kept": 4, "near_dup": 2, "undecodable": 2,
                      "unknown_format": 1, "unsupported_modality": 2}
    # ledger rows come out in REJECT_ORDER with 'kept' first
    assert [r.stage for r in stats.collect()] == [
        "kept"] + [s for s in REJECT_ORDER
                   if s in ledger]


def test_first_failing_gate_only(spark):
    """A row failing multiple gates carries only the FIRST: the flat
    40-copy pile is near-dup fodder AND hot-bucket fodder — under a
    tiny cap it is quarantined (admitted, reported), never re-labelled
    by a later stage."""
    flat = _png_encode(_img(0))
    rows = [(i, "image", flat, None) for i in range(40)]
    other = _img(3)
    bright = np.clip(other.astype(np.int16) + 25, 0, 255).astype(np.uint8)
    rows += [(100, "image", _png_encode(other), None),
             (101, "image", _png_encode(bright), None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    cfg = MediaCurationConfig(max_bucket=20)
    rejects, quarantine = media_curation_rejects(
        media, cfg, with_quarantine=True
    )
    got = {r.media_id: r.reject_reason for r in rejects.collect()}
    # the disjoint mutation pair still dedups; the flat pile is
    # quarantined wholesale (admitted) and appears in the ledger
    assert got == {101: "near_dup"}
    q = quarantine.collect()
    assert q, "hot flat-image bucket must be reported"
    assert {r.modality for r in q} == {"image"}
    assert all(r.n_docs == 40 for r in q)


def test_audio_only_config(spark):
    media, _, _ = _corpus(spark)
    cfg = MediaCurationConfig(modalities=("audio",))
    rejects = {r.media_id: r.reject_reason
               for r in media_curation_rejects(media, cfg).collect()}
    # every image row is now unsupported; audio routing unchanged
    for img_id in (1, 2, 3, 20):
        assert rejects[img_id] == "unsupported_modality"
    assert rejects[11] == "near_dup"
    assert rejects[21] == "undecodable"
    assert 10 not in rejects and 12 not in rejects


def test_video_tier_with_demuxed_frames(spark):
    """The video tier joins the funnel when a demuxed frames table is
    supplied: near-dup galleries collapse to the min-id canonical, a
    video whose frames all fail to decode routes 'undecodable', and a
    video-modality row absent from the frames table likewise."""
    from web3_flight_rpc_server_spark.multimodal.media import FRAMES_SCHEMA

    def frame(seed, k):
        img = 128 + 44 * np.sin(
            (0.07 + 0.04 * seed)
            * np.mgrid[0:48, 0:64][1].astype(np.float64) + 0.15 * k
        )
        gray = np.clip(img, 40, 215).astype(np.uint8)
        return _png_encode(np.repeat(gray[..., None], 3, axis=2))

    gallery = [frame(0, k) for k in range(6)]
    mp4 = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _mp4_box(
        b"moov",
        _mp4_box(b"mvhd", struct.pack(">B3x", 0) + b"\x00" * 8
                 + struct.pack(">II", 600, 9000) + b"\x00" * 80),
    )
    media = spark.createDataFrame(
        [
            (1, "video", mp4, None),   # orig gallery: canonical
            (2, "video", mp4, None),   # dropped-frame twin: near_dup
            (3, "video", mp4, None),   # all frames corrupt: undecodable
            (4, "video", mp4, None),   # demux produced nothing: undecodable
        ],
        MEDIA_SCHEMA,
    )
    frames_rows = [(1, i, b) for i, b in enumerate(gallery)]
    frames_rows += [(2, i, b) for i, b in enumerate(gallery[1:])]
    frames_rows += [(3, i, b"\x00corrupt" + bytes([i])) for i in range(3)]
    frames = spark.createDataFrame(frames_rows, FRAMES_SCHEMA)

    cfg = MediaCurationConfig(modalities=("video",))
    rejects = {r.media_id: r.reject_reason
               for r in media_curation_rejects(
                   media, cfg, frames=frames).collect()}
    assert rejects == {2: "near_dup", 3: "undecodable", 4: "undecodable"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="frames"):
        media_curation_rejects(media, cfg)


def test_incremental_ingest_against_persistent_index(spark, tmp_path):
    """The production loop: batch 2 is curated against the persistent
    per-modality indexes of batch 1's kept media (corpus_dup gate),
    and a crash-replay of batch 2 converges — everything it admitted
    now collides with itself at Hamming 0, nothing re-admits, the
    index does not grow."""
    from web3_flight_rpc_server_spark.pipelines.media_curation import (
        ingest_media_batch,
    )

    idx = str(tmp_path / "media_index")
    img0, img1 = _img(0), _img(1)
    mel = _melody(0)
    b1 = spark.createDataFrame(
        [(1, "image", _png_encode(img0), None),
         (2, "audio", _wav(mel), None)], MEDIA_SCHEMA)
    rejects1, admitted1 = ingest_media_batch(b1, idx)
    assert rejects1.isEmpty()
    assert {r.media_id for r in admitted1.collect()} == {1, 2}

    bright = np.clip(img0.astype(np.int16) + 25, 0, 255).astype(np.uint8)
    b2 = spark.createDataFrame(
        [(10, "image", _png_encode(bright), None),   # dup of kept 1
         (11, "image", _png_encode(img1), None),     # fresh
         (12, "audio", _wav(mel * 0.5), None),       # dup of kept 2
         (13, "image", b"\x00junk", None)],          # triage reject
        MEDIA_SCHEMA)
    rejects2, admitted2 = ingest_media_batch(b2, idx)
    got = {r.media_id: r.reject_reason for r in rejects2.collect()}
    assert got == {10: "corpus_dup", 12: "corpus_dup",
                   13: "unknown_format"}
    assert {r.media_id for r in admitted2.collect()} == {11}

    img_index_ids = {
        r.id for r in spark.read.parquet(f"{idx}/image/chunks")
        .select("id").distinct().collect()
    }
    assert img_index_ids == {1, 11}

    # crash-replay of batch 2: converges, index unchanged
    spark.catalog.refreshByPath(f"{idx}/image/chunks")
    spark.catalog.refreshByPath(f"{idx}/audio/chunks")
    rejects2r, admitted2r = ingest_media_batch(b2, idx)
    gotr = {r.media_id: r.reject_reason for r in rejects2r.collect()}
    assert gotr == {10: "corpus_dup", 11: "corpus_dup",
                    12: "corpus_dup", 13: "unknown_format"}
    assert admitted2r.isEmpty()
    assert {
        r.id for r in spark.read.parquet(f"{idx}/image/chunks")
        .select("id").distinct().collect()
    } == {1, 11}


def test_incremental_indexes_built_capped_by_default(spark, tmp_path):
    """ingest_media_batch resolves the config's cap sentinel exactly
    like every pair entry point (r7 ADVICE): the PERSISTENT
    per-modality indexes carry DEFAULT_MAX_BUCKET in their manifests
    (probes get the hot-bucket quarantine), an explicit None opts out,
    and an explicit int pins that int."""
    from web3_flight_rpc_server_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
    )
    from web3_flight_rpc_server_spark.operators.fp_index import (
        _read_fp_manifest,
    )
    from web3_flight_rpc_server_spark.pipelines.media_curation import (
        MediaCurationConfig,
        ingest_media_batch,
    )

    batch = spark.createDataFrame(
        [(1, "image", _png_encode(_img(0)), None)], MEDIA_SCHEMA)
    for cfg, want in (
        (MediaCurationConfig(modalities=("image",)), DEFAULT_MAX_BUCKET),
        (MediaCurationConfig(modalities=("image",), max_bucket=None), None),
        (MediaCurationConfig(modalities=("image",), max_bucket=7), 7),
    ):
        idx = str(tmp_path / f"idx_{want}")
        ingest_media_batch(batch, idx, cfg)
        assert _read_fp_manifest(spark, f"{idx}/image").max_bucket == want


def test_replay_of_quarantined_bucket_is_corpus_dup_by_identity(
        spark, tmp_path):
    """A replayed batch whose fingerprints sit in a QUARANTINED bucket
    (population past the cap) must still report corpus_dup and admit
    nothing: the probe is blind there by contract (the cap's
    documented recall loss), but the rows' media_ids are already in
    the index — id identity is cap-independent. Caught at the 1e5
    scale by tools/media_scale_bench.py (a 6k flat-template replay
    re-reported all 6k as admitted; BASELINE.md r10)."""
    from web3_flight_rpc_server_spark.pipelines.media_curation import (
        ingest_media_batch,
    )

    idx = str(tmp_path / "media_index")
    flat = np.full((24, 32, 3), 128, np.uint8)
    batch = spark.createDataFrame(
        [(i, "image", _png_encode(flat), None) for i in range(1, 4)],
        MEDIA_SCHEMA,
    )
    cfg = MediaCurationConfig(modalities=("image",), max_bucket=2)
    rejects1, admitted1 = ingest_media_batch(batch, idx, cfg)
    # bucket population 3 > cap 2: the batch-internal near-dup join is
    # blind, all three admit (quarantine = reported recall loss)
    assert rejects1.isEmpty()
    assert {r.media_id for r in admitted1.collect()} == {1, 2, 3}

    spark.catalog.refreshByPath(f"{idx}/image/chunks")
    rejects2, admitted2 = ingest_media_batch(batch, idx, cfg)
    got = {r.media_id: r.reject_reason for r in rejects2.collect()}
    assert got == {1: "corpus_dup", 2: "corpus_dup", 3: "corpus_dup"}
    assert admitted2.isEmpty()
    assert {
        r.id for r in spark.read.parquet(f"{idx}/image/chunks")
        .select("id").distinct().collect()
    } == {1, 2, 3}


def test_replay_identity_runs_on_metastore_tier_index(spark, tmp_path):
    """The corpus-dup-by-identity replay check must go through the
    tier-aware chunk reader: a metastore-tier index (manifest
    chunks_table set, chunks stored as a bucketed TABLE, no chunks/
    parquet dir) has nothing for a raw spark.read.parquet to find, and
    the r10 fix's original shape swallowed that AnalysisException as
    "first batch" — silently resurfacing the quarantined-bucket replay
    bug on exactly this tier (r10 ADVICE). Pre-creating the image
    index on the metastore tier and replaying a quarantined batch must
    still reject every row as corpus_dup."""
    from web3_flight_rpc_server_spark.multimodal.neardup import (
        perceptual_hash,
    )
    from web3_flight_rpc_server_spark.operators.fp_index import (
        write_fingerprint_index,
    )
    from web3_flight_rpc_server_spark.pipelines.media_curation import (
        ingest_media_batch,
    )

    idx = str(tmp_path / "media_index")
    flat = np.full((24, 32, 3), 128, np.uint8)
    batch = spark.createDataFrame(
        [(i, "image", _png_encode(flat), None) for i in range(1, 4)],
        MEDIA_SCHEMA,
    )
    cfg = MediaCurationConfig(modalities=("image",), max_bucket=2)
    # pre-create the image tier's index on the METASTORE tier, empty,
    # with the same layout ingest_media_batch would bootstrap
    fps_schema = perceptual_hash(batch, cfg.image_method).schema
    spark.sql("DROP TABLE IF EXISTS media_fp_replay_tier")
    write_fingerprint_index(
        spark.createDataFrame([], fps_schema), f"{idx}/image",
        max_hamming=cfg.image_max_hamming, id_col="media_id",
        fp_col="phash", max_bucket=cfg.max_bucket,
        chunks_table="media_fp_replay_tier",
    )

    rejects1, admitted1 = ingest_media_batch(batch, idx, cfg)
    assert rejects1.isEmpty()
    assert {r.media_id for r in admitted1.collect()} == {1, 2, 3}

    rejects2, admitted2 = ingest_media_batch(batch, idx, cfg)
    got = {r.media_id: r.reject_reason for r in rejects2.collect()}
    assert got == {1: "corpus_dup", 2: "corpus_dup", 3: "corpus_dup"}
    assert admitted2.isEmpty()
    spark.sql("DROP TABLE IF EXISTS media_fp_replay_tier")
