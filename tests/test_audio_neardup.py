"""Audio near-dup tier (VERDICT r6 ask #6): spectral fingerprints over
the real WAV/AIFF decoders feeding the text tier's fingerprint
blocking — the corpus/verification strategy mirrors
tests/test_image_neardup.py exactly.

Base clips are 9-segment "melodies" (two sinusoids per segment, seed-
dependent frequencies in 150–3500 Hz) — real spectral structure that
VARIES across the fingerprint's time windows. Each base gets the
mutations an audio pipeline must survive: a gain shift, a resample
(FFT-based / sinc-quality, the fidelity a real resampler delivers —
crude linear interpolation distorts near-Nyquist tones by far more
than any fingerprint could absorb), and silence padding. Verification
is brute force: the blocked join's pair set must EQUAL all-pairs
Hamming over the same fingerprints, and planted groups must cluster.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from web3_flight_rpc_server_spark.multimodal.media import MEDIA_SCHEMA
from web3_flight_rpc_server_spark.multimodal.neardup import (
    audio_fingerprint,
    audio_neardup_clusters,
    audio_neardup_pairs,
)

RATE = 8000
RADIUS = 6


def _wav_bytes(pcm: np.ndarray, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            (np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def _melody(seed: int, rate: int = RATE, dur: float = 1.8) -> np.ndarray:
    rng = np.random.default_rng(seed)
    seg_len = int(rate * dur / 9)
    freqs = np.geomspace(150, 3500, 24)
    out = []
    for _ in range(9):
        f1, f2 = rng.choice(freqs, 2, replace=False)
        t = np.arange(seg_len) / rate
        out.append(0.5 * np.sin(2 * np.pi * f1 * t)
                   + 0.3 * np.sin(2 * np.pi * f2 * t))
    return np.concatenate(out)


def _fft_resample(pcm: np.ndarray, r_from: int, r_to: int) -> np.ndarray:
    n_new = int(round(len(pcm) * r_to / r_from))
    sp = np.fft.rfft(pcm)
    out_sp = np.zeros(n_new // 2 + 1, complex)
    k = min(len(sp), len(out_sp))
    out_sp[:k] = sp[:k]
    return np.fft.irfft(out_sp, n_new) * (n_new / len(pcm))


def _mutations(pcm: np.ndarray) -> dict[str, bytes]:
    pad = np.zeros(RATE // 5)
    return {
        "orig": _wav_bytes(pcm, RATE),
        "gain": _wav_bytes(pcm * 0.4, RATE),
        "resample12k": _wav_bytes(_fft_resample(pcm, RATE, 12000), 12000),
        "padded": _wav_bytes(np.concatenate([pad, pcm, pad]), RATE),
        "gain_pad": _wav_bytes(
            np.concatenate([pad, pcm * 0.6, pad]), RATE
        ),
    }


def _corpus(spark, n_bases: int = 4):
    """media_id = base * 10 + mutation_idx; plus rows that must
    silently produce no fingerprint: a non-audio payload, a corrupt
    WAV (valid RIFF magic, truncated body), a pure-silence clip, and a
    sub-50 ms blip."""
    rows = []
    for base in range(n_bases):
        muts = sorted(_mutations(_melody(base)).items())
        for j, (_, blob) in enumerate(muts):
            rows.append((base * 10 + j, "audio", blob, None))
    rows.append((900, "image", b"\x89PNGnot-audio", None))
    rows.append((901, "audio", _wav_bytes(_melody(0), RATE)[:40], None))
    rows.append((902, "audio", _wav_bytes(np.zeros(RATE), RATE), None))
    rows.append((903, "audio",
                 _wav_bytes(np.sin(np.arange(80) / 4), RATE), None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_mutation_groups_pair_and_bases_do_not(spark):
    media = _corpus(spark)
    pairs = {(r.d1, r.d2): r.hamming
             for r in audio_neardup_pairs(media, RADIUS).collect()}
    for (d1, d2), ham in pairs.items():
        assert d1 // 10 == d2 // 10, (
            f"unrelated melodies paired: {d1}-{d2} at hamming {ham}"
        )
    # every mutation stays within the radius of its base's original
    # (mutation idx 2 == "orig" in the sorted mutation order)
    names = sorted(_mutations(_melody(0)))
    orig_j = names.index("orig")
    for base in range(4):
        for j in range(len(names)):
            if j == orig_j:
                continue
            key = (min(base * 10 + orig_j, base * 10 + j),
                   max(base * 10 + orig_j, base * 10 + j))
            assert key in pairs, f"mutation {names[j]} of base {base} lost"
    # junk/silent/non-audio rows produce no fingerprints -> no pairs
    assert all(d < 900 for p in pairs for d in p)


def test_blocked_join_equals_brute_force(spark):
    media = _corpus(spark)
    fps = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    assert all(i < 900 for i in fps), "junk rows must yield no fingerprint"
    brute = set()
    ids = sorted(fps)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            if bin((fps[d1] ^ fps[d2]) & (2 ** 64 - 1)).count("1") <= RADIUS:
                brute.add((d1, d2))
    blocked = {
        (r.d1, r.d2)
        for r in audio_neardup_pairs(media, RADIUS, max_bucket=None).collect()
    }
    assert blocked == brute
    assert brute, "corpus must contain true near-dup pairs"


def test_clusters_are_the_mutation_groups(spark):
    media = _corpus(spark)
    clusters: dict[int, set[int]] = {}
    for r in audio_neardup_clusters(media, RADIUS).collect():
        clusters.setdefault(r.cluster_id, set()).add(r.node)
    for base in range(4):
        members = clusters.get(base * 10)
        assert members is not None, f"base {base} group missing"
        assert members <= set(range(base * 10, base * 10 + 5))
        assert len(members) >= 4


def test_plan_is_capped_equi_join_no_cartesian(spark):
    media = _corpus(spark, n_bases=2)
    df = audio_neardup_pairs(media, RADIUS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan  # the default hot-bucket cap is live


def test_hot_bucket_cap_quarantines_identical_clips(spark):
    """A pile of byte-identical clips (re-uploaded ringtone case)
    lands in ONE fingerprint bucket per chunk; the cap must quarantine
    it while a disjoint mutation pair survives."""
    clip = _wav_bytes(_melody(0), RATE)
    rows = [(i, "audio", clip, None) for i in range(40)]
    other = _melody(5)
    rows += [(100, "audio", _wav_bytes(other, RATE), None),
             (101, "audio", _wav_bytes(other * 0.5, RATE), None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r.d1, r.d2)
        for r in audio_neardup_pairs(media, RADIUS, max_bucket=20).collect()
    }
    assert (100, 101) in pairs
    assert len(pairs) <= 3, f"cap leaked the identical-clip bucket: {len(pairs)}"
