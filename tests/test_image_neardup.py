"""Image near-dup tier (VERDICT r5 #4): perceptual hashes over the
real decoders feeding the text tier's fingerprint blocking.

The corpus is engineered the way tests/test_hot_buckets.py engineers
skew: base images are distinct smooth luminance patterns; each base
gets the mutations a real pipeline must survive — JPEG recompression
(two qualities), a resize, a brightness shift — plus unrelated bases
that must NOT pair. Verification is brute force: the blocked join's
pair set must EQUAL all-pairs Hamming over the same fingerprints
(pigeonhole exactness), and the planted mutation groups must cluster.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.multimodal.jpeg import encode_baseline
from web3_flight_rpc_server_spark.multimodal.media import (
    MEDIA_SCHEMA,
    _png_encode,
    _resize_bilinear,
)
from web3_flight_rpc_server_spark.multimodal.neardup import (
    image_neardup_clusters,
    image_neardup_pairs,
    perceptual_hash,
)

W, H = 64, 48
RADIUS = 6

# A structurally-valid GIF89a (header, global color table, image
# descriptor) whose LZW data sub-block claims 32 bytes but the payload
# is cut short — the shape of a truncated upload.
_TRUNCATED_GIF = (
    b"GIF89a" + b"\x10\x00\x10\x00"      # 16x16
    + b"\x80\x00\x00"                     # global table, 2 entries
    + b"\x00\x00\x00\xff\xff\xff"         # palette
    + b"\x2c\x00\x00\x00\x00\x10\x00\x10\x00\x00"  # image descriptor
    + b"\x02\x20"                          # LZW min size 2, block len 32
    + b"\x8c\x2d"                          # ...but only 2 bytes follow
)


def _base(seed: int) -> np.ndarray:
    """A smooth, structured luminance field (sum of two sinusoids with
    seed-dependent frequency/phase), kept inside [40, 215] so the
    brightness mutation cannot clip and the JPEG mutation has real
    gradients to preserve. Distinct seeds give distinct gradient
    structure — dHash separates them by ~tens of bits."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    a = 0.07 + 0.04 * seed
    b = 0.11 + 0.03 * seed
    img = (
        128
        + 44 * np.sin(a * xx + 0.7 * seed)
        + 44 * np.sin(b * yy + 1.3 * seed)
    )
    gray = np.clip(img, 40, 215).astype(np.uint8)
    return np.repeat(gray[..., None], 3, axis=2)


def _mutations(img: np.ndarray) -> dict[str, bytes]:
    return {
        "orig_png": _png_encode(img),
        "jpeg_q85": encode_baseline(img, quality=85),
        "jpeg_q35": encode_baseline(img, quality=35),
        "resized": _png_encode(_resize_bilinear(img, W * 3 // 4, H * 3 // 4)),
        "brightness": _png_encode(
            np.clip(img.astype(np.int16) + 25, 0, 255).astype(np.uint8)
        ),
    }


def _corpus(spark, n_bases: int = 4):
    """media_id = base * 10 + mutation_idx; one junk row (undecodable)
    and one audio row that must silently produce no fingerprint."""
    rows = []
    for base in range(n_bases):
        for j, (_, blob) in enumerate(sorted(_mutations(_base(base)).items())):
            rows.append((base * 10 + j, "image", blob, None))
    rows.append((900, "image", b"\x00\x01not-an-image", None))
    rows.append((901, "audio", b"RIFFjunk", None))
    # corrupt-but-plausible payloads (r6 ADVICE): a real PNG whose IDAT
    # bytes are flipped raises zlib.error inside the inflater, and a
    # GIF cut mid-LZW raises from the code-stream walk — classes the
    # old narrow except clause did NOT catch; both must drop, not
    # poison the Spark task.
    good_png = _png_encode(_base(0))
    idat = good_png.find(b"IDAT")
    rows.append((902, "image",
                 good_png[:idat + 4]
                 + bytes(b ^ 0xFF for b in good_png[idat + 4:idat + 12])
                 + good_png[idat + 12:], None))
    rows.append((903, "image", _TRUNCATED_GIF, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_mutation_groups_pair_and_bases_do_not(spark):
    media = _corpus(spark)
    pairs = {(r.d1, r.d2): r.hamming
             for r in image_neardup_pairs(media, RADIUS).collect()}
    for (d1, d2), ham in pairs.items():
        assert d1 // 10 == d2 // 10, (
            f"unrelated bases paired: {d1}-{d2} at hamming {ham}"
        )
    # every mutation stays within the radius of its base's original
    for base in range(4):
        for j in range(1, 5):
            key = (min(base * 10, base * 10 + j),
                   max(base * 10, base * 10 + j))
            assert key in pairs, f"mutation {key} not recovered"
    # junk/audio rows produce no fingerprints, so no pairs touch them
    assert all(d < 900 for p in pairs for d in p)


def test_blocked_join_equals_brute_force(spark):
    """Pigeonhole exactness carries over from the SimHash tier: the
    chunk-blocked pair set equals all-pairs Hamming over the same
    fingerprints (max_bucket=None — the exact path)."""
    media = _corpus(spark)
    fps = {r.media_id: r.phash for r in perceptual_hash(media).collect()}
    brute = set()
    ids = sorted(fps)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            if bin((fps[d1] ^ fps[d2]) & (2 ** 64 - 1)).count("1") <= RADIUS:
                brute.add((d1, d2))
    blocked = {
        (r.d1, r.d2)
        for r in image_neardup_pairs(media, RADIUS, max_bucket=None).collect()
    }
    assert blocked == brute
    assert brute, "corpus must contain true near-dup pairs"


def test_clusters_are_the_mutation_groups(spark):
    media = _corpus(spark)
    clusters: dict[int, set[int]] = {}
    for r in image_neardup_clusters(media, RADIUS).collect():
        clusters.setdefault(r.cluster_id, set()).add(r.node)
    # each base's group is one cluster, canonical id = its min member
    for base in range(4):
        members = clusters.get(base * 10)
        assert members is not None, f"base {base} group missing"
        assert members <= set(range(base * 10, base * 10 + 5))
        assert len(members) >= 4  # original + at least 3 mutations


def test_ahash_variant_and_bad_method(spark):
    media = _corpus(spark, n_bases=2)
    fps = perceptual_hash(media, method="ahash").collect()
    assert len(fps) == 10  # 2 bases x 5 variants; junk rows dropped
    with pytest.raises(ValueError, match="method"):
        perceptual_hash(media, method="md5")


def test_plan_is_capped_equi_join_no_cartesian(spark):
    """Same plan contract as the SimHash tier: a (chunk_idx, chunk)
    equi-join with the default cap's quarantine anti-join — never a
    cartesian/broadcast-nested-loop over image pairs."""
    media = _corpus(spark, n_bases=2)
    df = image_neardup_pairs(media, RADIUS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the default hot-bucket cap is live: its anti-join is in the plan
    assert "LeftAnti" in plan


def test_hot_bucket_cap_quarantines_flat_images(spark):
    """A pile of visually-identical images (the letterbox/flat-scan
    template case) lands in ONE fingerprint bucket per chunk; the cap
    must quarantine it while a disjoint mutation pair survives —
    the operators/dedup.py contract, inherited."""
    flat = _base(0)
    rows = [(i, "image", _png_encode(flat), None) for i in range(40)]
    other = _base(3)
    rows += [(100, "image", _png_encode(other), None),
             (101, "image", encode_baseline(other, quality=85), None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r.d1, r.d2)
        for r in image_neardup_pairs(media, RADIUS, max_bucket=20).collect()
    }
    assert (100, 101) in pairs
    assert len(pairs) <= 3, f"cap leaked the flat-image bucket: {len(pairs)}"
