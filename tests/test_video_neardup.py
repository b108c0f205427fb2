"""Video near-dup tier (r7): per-frame perceptual hashes folded by a
JVM-side per-bit majority vote, riding the shared fingerprint
blocking — same corpus/verification strategy as the image and audio
tiers.

Base "videos" are 8-frame galleries of real PNG frames whose
luminance pattern drifts in phase frame-to-frame (temporal structure
the majority vote must integrate, not just one keyframe). Mutations a
real pipeline must survive: a dropped frame, an inserted duplicate
frame, every frame JPEG-recompressed, a global brightness shift.
Verification is brute force over the same fingerprints, plus plan
shape and the triage contract (corrupt frames drop; an all-corrupt
gallery yields no fingerprint)."""

from __future__ import annotations

import numpy as np

from web3_flight_rpc_server_spark.multimodal.jpeg import encode_baseline
from web3_flight_rpc_server_spark.multimodal.media import (
    FRAMES_SCHEMA,
    _png_encode,
)
from web3_flight_rpc_server_spark.multimodal.neardup import (
    video_fingerprint_from_frames,
    video_neardup_clusters,
    video_neardup_pairs,
)

W, H, N_FRAMES = 64, 48, 8
RADIUS = 8


def _frame(seed: int, k: int) -> np.ndarray:
    """Frame k of video `seed`: the image tier's sinusoid field with a
    per-frame phase drift — adjacent frames are similar, the sequence
    is distinctive."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    a = 0.07 + 0.04 * seed
    b = 0.11 + 0.03 * seed
    img = (128
           + 44 * np.sin(a * xx + 0.7 * seed + 0.15 * k)
           + 44 * np.sin(b * yy + 1.3 * seed + 0.1 * k))
    gray = np.clip(img, 40, 215).astype(np.uint8)
    return np.repeat(gray[..., None], 3, axis=2)


def _gallery(seed: int) -> list[np.ndarray]:
    return [_frame(seed, k) for k in range(N_FRAMES)]


def _mutations(frames: list[np.ndarray]) -> dict[str, list[bytes]]:
    png = [_png_encode(f) for f in frames]
    return {
        "orig": png,
        "dropped": png[:3] + png[4:],
        "inserted": png[:5] + [png[4]] + png[5:],
        "recompressed": [encode_baseline(f, quality=85) for f in frames],
        "brightness": [
            _png_encode(np.clip(f.astype(np.int16) + 20, 0, 255)
                        .astype(np.uint8))
            for f in frames
        ],
    }


def _corpus(spark, n_bases: int = 3):
    """media_id = base * 10 + mutation_idx; frame rows in FRAMES_SCHEMA.
    One gallery (900) mixes a corrupt frame into a real one (must
    still fingerprint from the surviving frames); one gallery (901) is
    ALL corrupt (must yield no fingerprint)."""
    rows = []
    for base in range(n_bases):
        muts = sorted(_mutations(_gallery(base)).items())
        for j, (_, blobs) in enumerate(muts):
            for idx, blob in enumerate(blobs):
                rows.append((base * 10 + j, idx, blob))
    good = [_png_encode(f) for f in _gallery(7)]
    rows += [(900, i, b) for i, b in enumerate(good)]
    rows.append((900, len(good), b"\x89PNG\r\n\x1a\nbroken"))
    rows += [(901, i, b"\x00junkframe" + bytes([i])) for i in range(4)]
    return spark.createDataFrame(rows, FRAMES_SCHEMA)


def test_mutation_groups_pair_and_bases_do_not(spark):
    frames = _corpus(spark)
    pairs = {(r.d1, r.d2): r.hamming
             for r in video_neardup_pairs(frames, RADIUS).collect()}
    for (d1, d2), ham in pairs.items():
        assert d1 // 10 == d2 // 10 or {d1, d2} == {900}, (
            f"unrelated videos paired: {d1}-{d2} at hamming {ham}"
        )
    names = sorted(_mutations(_gallery(0)))
    orig_j = names.index("orig")
    for base in range(3):
        for j in range(len(names)):
            if j == orig_j:
                continue
            key = (min(base * 10 + orig_j, base * 10 + j),
                   max(base * 10 + orig_j, base * 10 + j))
            assert key in pairs, f"mutation {names[j]} of base {base} lost"


def test_blocked_join_equals_brute_force_and_triage(spark):
    frames = _corpus(spark)
    fps = {r.media_id: r.vfp
           for r in video_fingerprint_from_frames(frames).collect()}
    # the mixed gallery fingerprints from its surviving frames; the
    # all-corrupt one yields nothing
    assert 900 in fps and 901 not in fps
    brute = set()
    ids = sorted(fps)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            if bin((fps[d1] ^ fps[d2]) & (2 ** 64 - 1)).count("1") <= RADIUS:
                brute.add((d1, d2))
    blocked = {
        (r.d1, r.d2)
        for r in video_neardup_pairs(frames, RADIUS, max_bucket=None).collect()
    }
    assert blocked == brute
    assert brute, "corpus must contain true near-dup pairs"


def test_clusters_are_the_mutation_groups(spark):
    frames = _corpus(spark)
    clusters: dict[int, set[int]] = {}
    for r in video_neardup_clusters(frames, RADIUS).collect():
        clusters.setdefault(r.cluster_id, set()).add(r.node)
    for base in range(3):
        members = clusters.get(base * 10)
        assert members is not None, f"base {base} group missing"
        assert members <= set(range(base * 10, base * 10 + 5))
        assert len(members) >= 4


def test_majority_vote_is_jvm_side_and_plan_capped(spark):
    """No Python evaluation past the per-frame hash stage: exactly one
    Arrow-batched python node (the mapInPandas hash) in the
    fingerprint plan, the vote is codegen aggregates; the pair join is
    the capped equi-join with no cartesian."""
    frames = _corpus(spark, n_bases=2)
    fp_plan = video_fingerprint_from_frames(frames) \
        ._jdf.queryExecution().executedPlan().toString()
    assert fp_plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in fp_plan
    pair_plan = video_neardup_pairs(frames, RADIUS) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pair_plan
    assert "BroadcastNestedLoopJoin" not in pair_plan
    assert "LeftAnti" in pair_plan  # default hot-bucket cap live
