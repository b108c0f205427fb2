"""Multimodal plumbing tests: schema, roundtrip, batch shapes, and
integration of binary-derived features with the similarity operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.multimodal import (
    MEDIA_SCHEMA,
    byte_histogram_features,
    decode_media,
    frame_sample,
    resize_images,
    synthesize_media,
)
from web3_flight_rpc_server_spark.operators.similarity import cosine_topk


def test_synthesize_schema_and_determinism(spark):
    media = synthesize_media(spark, n=30)
    assert media.schema == MEDIA_SCHEMA
    a = {r.media_id: bytes(r.content) for r in media.collect()}
    b = {r.media_id: bytes(r.content) for r in synthesize_media(spark, n=30).collect()}
    assert a == b, "generation must be deterministic per media_id"
    kinds = {r.media_id % 3: r.kind for r in media.select("media_id", "kind").collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video"}


def test_decode_roundtrip(spark):
    decoded = decode_media(synthesize_media(spark, n=30)).collect()
    for r in decoded:
        assert r.decoded_kind == r.kind
        assert r.decoded_width == r.meta.width
        assert r.decoded_height == r.meta.height
        assert r.payload_len == r.meta.n_bytes - 11  # header is 11 bytes


def test_metadata_only_query_prunes_payload(spark, tmp_path):
    """The point of the typed meta struct: a metadata query over the
    parquet-backed table must not read the content column."""
    path = str(tmp_path / "media")
    synthesize_media(spark, n=30).write.parquet(path)
    q = spark.read.parquet(path).where(F.col("kind") == "image").select(
        "media_id", "meta.width", "meta.height"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan, "payload column must be pruned"


def test_byte_histogram_features_feed_similarity(spark):
    feats = byte_histogram_features(synthesize_media(spark, n=30))
    rows = feats.collect()
    assert all(len(r.features) == 64 for r in rows)
    assert all(abs(sum(r.features) - 1.0) < 1e-3 for r in rows)
    # binary-derived features flow straight into the vector operators
    renamed = feats.select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    top = cosine_topk(
        renamed.where(F.col("vec_id") != 0), renamed.where(F.col("vec_id") == 0), k=5
    ).collect()
    assert len(top) == 5
    assert all(-1.0 <= r.cos <= 1.0 + 1e-9 for r in top)


def test_resize_updates_payload_and_meta(spark):
    resized = resize_images(synthesize_media(spark, n=12), 8, 8)
    for r in resized.where(F.col("kind") == "image").collect():
        assert (r.meta.width, r.meta.height) == (8, 8)
        assert len(bytes(r.content)) == 11 + 64
    # non-images pass through untouched
    audio = resized.where(F.col("kind") == "audio").collect()
    assert all(r.meta.width != 8 or r.meta.n_bytes != 75 for r in audio)


def test_frame_sampling(spark):
    frames = frame_sample(synthesize_media(spark, n=30), every_n=2).collect()
    assert frames, "video rows must produce frames"
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for media_id, idxs in by_media.items():
        assert media_id % 3 == 2, "only videos produce frames"
        assert sorted(idxs) == list(range(0, 4 + media_id % 4, 2))


def test_real_media_bytes_raise_cleanly(spark):
    # a truncated JPEG reaches the real decoder (r5) and fails its
    # structural validation rather than silently yielding pixels
    fake_jpeg = spark.createDataFrame(
        [(1, "image", b"\xff\xd8\xff\xe0fakejpeg", None)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="missing SOF|ValueError"):
        decode_media(fake_jpeg).collect()
    # formats with no stdlib codec still refuse honestly
    fake_mp3 = spark.createDataFrame(
        [(1, "audio", b"ID3\x04fakemp3bytes", None)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="SYNM|NotImplementedError"):
        decode_media(fake_mp3).collect()


FIXTURES = __file__.rsplit("/", 1)[0] + "/fixtures"


def _fixture_df(spark, *names):
    rows = []
    for i, name in enumerate(names):
        with open(f"{FIXTURES}/{name}", "rb") as fh:
            blob = fh.read()
        kind = "audio" if name.endswith(".wav") else "image"
        rows.append((i, kind, blob, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_png_decodes_through_arrow_path(spark):
    """A real PNG fixture (8-bit RGB, committed in-repo) decodes to
    pixel dims and payload length via the stdlib zlib+unfilter codec,
    through the same mapInPandas Arrow path as everything else."""
    media = _fixture_df(spark, "gradient_f0.png")
    row = decode_media(media).collect()[0]
    assert (row.decoded_kind, row.decoded_width, row.decoded_height) == (
        "image", 8, 5
    )
    assert row.payload_len == 8 * 5 * 3


def test_png_unfilters_validated_against_filter0_twin(spark):
    """gradient_mixed.png carries the SAME pixels as gradient_f0.png
    under Sub/Up/Average/Paeth scanline filters; filter 0 is trivially
    correct to decode, so byte-identical decoded features across the
    two files pin the unfilter implementations without trusting the
    fixture encoder's filters."""
    media = _fixture_df(spark, "gradient_f0.png", "gradient_mixed.png")
    feats = {
        r.media_id: list(r.features)
        for r in byte_histogram_features(media, bins=256).collect()
    }
    assert feats[0] == feats[1]
    assert sum(feats[0]) == pytest.approx(1.0, abs=1e-5)


def test_real_wav_decodes_pcm_stats(spark):
    """The committed WAV fixture (16-bit mono PCM, 8 kHz, 64 frames)
    decodes via the stdlib wave module: channels/rate/frame-count land
    in the decoded columns and the payload is the PCM byte stream."""
    media = _fixture_df(spark, "tone.wav")
    row = decode_media(media).collect()[0]
    assert row.decoded_kind == "audio"
    assert row.decoded_width == 1        # channels
    assert row.decoded_height == 8000    # sample rate
    assert row.payload_len == 64 * 2     # frames x 16-bit


def test_audio_features_recover_known_tone(spark):
    """Real DSP features through the Arrow path: the committed
    tone.wav is a 500 Hz square wave at 8 kHz (period 16 samples), so
    the dominant rFFT bin must land exactly at 500 Hz with a spectral
    centroid above it (square waves carry odd harmonics); a
    synthesized pure sine's centroid collapses onto its own
    frequency."""
    import io
    import math
    import struct as _s
    import wave as _w

    from web3_flight_rpc_server_spark.multimodal.media import audio_features

    # pure 1 kHz sine, 8 kHz, 1024 samples
    buf = io.BytesIO()
    with _w.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(
            _s.pack("<h", int(20000 * math.sin(2 * math.pi * 1000 * i / 8000)))
            for i in range(1024)
        ))
    media = _fixture_df(spark, "tone.wav")
    sine = spark.createDataFrame(
        [(99, "audio", buf.getvalue(), None)], MEDIA_SCHEMA
    )
    rows = {
        r.media_id: r
        for r in audio_features(media.unionByName(sine)).collect()
    }

    tone = rows[0]
    assert tone.sample_rate == 8000 and tone.n_samples == 64
    assert tone.dominant_freq_hz == pytest.approx(500.0)
    assert tone.spectral_centroid_hz > 600  # odd harmonics pull it up
    assert 0.3 < tone.rms < 0.5  # +-12000/32768 square
    assert tone.zero_crossing_rate == pytest.approx(7 / 63)

    s = rows[99]
    assert s.dominant_freq_hz == pytest.approx(1000.0, abs=8)
    assert s.spectral_centroid_hz == pytest.approx(1000.0, abs=30)
    assert s.rms == pytest.approx(20000 / 32768 / math.sqrt(2), rel=0.02)


AIFF_SINE = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/Sine-1000Hz-300ms.aif"
GSUTIL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
              "test_data/test.mp3")


def test_third_party_aiff_decodes_and_features_recover_1khz(spark):
    """CPython's Sine-1000Hz-300ms.aif (stereo 48 kHz AIFF, NOT made
    by this repo): the stdlib aifc path decodes it through the Arrow
    pipeline and the FFT features recover exactly the advertised
    1 kHz tone."""
    import os

    from web3_flight_rpc_server_spark.multimodal.media import audio_features

    if not os.path.exists(AIFF_SINE):
        pytest.skip("CPython AIFF fixture not present")
    blob = open(AIFF_SINE, "rb").read()
    media = spark.createDataFrame(
        [(7, "audio", blob, None)], MEDIA_SCHEMA
    )
    row = decode_media(media).collect()[0]
    assert (row.decoded_kind, row.decoded_width, row.decoded_height) == (
        "audio", 2, 48000
    )
    feat = audio_features(media).collect()[0]
    assert feat.sample_rate == 48000 and feat.n_samples == 14400
    assert feat.dominant_freq_hz == pytest.approx(1000.0, abs=4)
    assert feat.spectral_centroid_hz == pytest.approx(1000.0, abs=40)


def test_mp3_metadata_parses_real_file():
    """gsutil's real-world test.mp3: frame headers parse to a
    consistent (duration, bitrate, size) triple without decoding a
    single sample."""
    import os

    from web3_flight_rpc_server_spark.multimodal.containers import (
        mp3_metadata,
    )

    if not os.path.exists(GSUTIL_MP3):
        pytest.skip("gsutil mp3 fixture not present")
    data = open(GSUTIL_MP3, "rb").read()
    meta = mp3_metadata(data)
    assert meta["has_id3"]
    assert meta["sample_rate"] in (8000, 11025, 12000, 16000, 22050,
                                   24000, 32000, 44100, 48000)
    assert meta["n_frames"] > 10
    assert meta["duration_s"] > 0.1
    # identity: duration * bitrate ~ audio payload size (frames only)
    audio_bytes = meta["duration_s"] * meta["avg_bitrate_kbps"] * 1000 / 8
    assert audio_bytes == pytest.approx(len(data), rel=0.25)

    with pytest.raises(ValueError, match="no valid MP3"):
        mp3_metadata(b"ID3\x03\x00\x00\x00\x00\x00\x05junk-no-frames")


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    import struct as _s

    return _s.pack(">I", 8 + len(payload)) + btype + payload


def _minimal_mp4(duration_units=9000, timescale=600, w=640, h=360) -> bytes:
    """Synthesized minimal ISO-BMFF tree (ftyp + moov(mvhd + trak(
    tkhd))) — no real MP4 ships in this environment, so this fixture
    validates STRUCTURAL parsing only (the docstring of mp4_metadata
    says so explicitly)."""
    import struct as _s

    mvhd = _s.pack(">B3x", 0) + b"\x00" * 8 + _s.pack(
        ">II", timescale, duration_units
    ) + b"\x00" * 80
    tkhd = _s.pack(">B3x", 0) + b"\x00" * 72 + _s.pack(
        ">II", w << 16, h << 16
    )
    moov = _mp4_box(b"mvhd", mvhd) + _mp4_box(
        b"trak", _mp4_box(b"tkhd", tkhd)
    )
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _mp4_box(
        b"moov", moov
    )


def test_mp4_box_parse_and_probe_media_triage(spark):
    """probe_media: one header-only pass over a mixed-format corpus —
    real PNG/WAV fixtures, the real gsutil MP3, a synthesized MP4 box
    tree, a SYNM blob, and a corrupt payload — classifying every row
    without decoding a sample and without dying on the junk."""
    import os

    from web3_flight_rpc_server_spark.multimodal.containers import (
        mp4_metadata,
        probe_media,
    )

    mp4 = _minimal_mp4()
    meta = mp4_metadata(mp4)
    assert meta == {"brand": "isom", "duration_s": 15.0,
                    "width": 640, "height": 360}

    rows = [
        (0, "image", open(f"{FIXTURES}/gradient_f0.png", "rb").read(), None),
        (1, "audio", open(f"{FIXTURES}/tone.wav", "rb").read(), None),
        (2, "video", mp4, None),
        (3, "video", b"\x00\x01garbage-not-a-container", None),
    ]
    if os.path.exists(GSUTIL_MP3):
        rows.append((4, "audio", open(GSUTIL_MP3, "rb").read(), None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in probe_media(media).collect()}

    assert (out[0].format, out[0].width, out[0].height) == ("png", 8, 5)
    assert (out[1].format, out[1].sample_rate, out[1].n_frames) == (
        "wav", 8000, 64
    )
    assert out[1].duration_s == pytest.approx(0.008)
    assert (out[2].format, out[2].width, out[2].height,
            out[2].duration_s) == ("mp4", 640, 360, 15.0)
    assert out[3].format == "unknown"
    if 4 in out:
        assert out[4].format == "mp3"
        assert out[4].duration_s == pytest.approx(1.176)
        assert out[4].bitrate_kbps == pytest.approx(64.0)


def test_probe_media_jpeg_dims_without_decode(spark):
    """JPEG dims from the SOF marker alone — including progressive
    files the full decoder refuses: triage still classifies them."""
    import os

    from web3_flight_rpc_server_spark.multimodal.containers import (
        probe_media,
    )

    flower = ("/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
              "requests/ext/flower-of-life.jpg")
    prog = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    rows = []
    if os.path.exists(flower):
        rows.append((1, "image", open(flower, "rb").read(), None))
    if os.path.exists(prog):
        rows.append((2, "image", open(prog, "rb").read(), None))
    if not rows:
        pytest.skip("no third-party jpegs present")
    out = {
        r.media_id: r
        for r in probe_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    if 1 in out:
        assert (out[1].format, out[1].width, out[1].height) == (
            "jpeg", 161, 161
        )
    if 2 in out:
        assert (out[2].format, out[2].width, out[2].height) == (
            "jpeg-progressive", 493, 58
        )


IMGDATA = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata"


def _read_ppm(path):
    import numpy as np

    d = open(path, "rb").read()
    tok = d.split(None, 4)
    w, h = int(tok[1]), int(tok[2])
    idx = d.index(b"255\n") + 4
    return np.frombuffer(d[idx:idx + w * h * 3], dtype=np.uint8).reshape(
        h, w, 3
    )


def test_bmp_decodes_pixel_exact_vs_lossless_twin(spark):
    """CPython's python.bmp (32-bit BI_BITFIELDS) is lossless, so the
    decode must match its PPM sibling byte-for-byte — the strongest
    conformance bar any codec here has."""
    import os

    import numpy as np

    if not os.path.exists(f"{IMGDATA}/python.bmp"):
        pytest.skip("CPython test images not present")
    from web3_flight_rpc_server_spark.multimodal.media import _codec

    _, dec = _codec()
    kind, w, h, _f, payload = dec(open(f"{IMGDATA}/python.bmp", "rb").read())
    assert (kind, w, h) == ("image", 16, 16)
    truth = _read_ppm(f"{IMGDATA}/python.ppm")
    got = np.frombuffer(payload, dtype=np.uint8).reshape(16, 16, 3)
    assert (got == truth).all()


def test_gif_decodes_pixel_exact_vs_imageio(spark):
    """CPython's python.gif through the LZW decoder vs the captured
    Java ImageIO decode (tests/fixtures/python_gif_imageio.ppm):
    pixel-exact on all 256 pixels, transparent ones included (both
    decoders surface the palette color there)."""
    import os

    import numpy as np

    if not os.path.exists(f"{IMGDATA}/python.gif"):
        pytest.skip("CPython test images not present")
    from web3_flight_rpc_server_spark.multimodal.media import _codec

    _, dec = _codec()
    kind, w, h, _f, payload = dec(open(f"{IMGDATA}/python.gif", "rb").read())
    assert (kind, w, h) == ("image", 16, 16)
    ref = _read_ppm(
        f"{__file__.rsplit('/', 1)[0]}/fixtures/python_gif_imageio.ppm"
    )
    got = np.frombuffer(payload, dtype=np.uint8).reshape(16, 16, 3)
    assert (got == ref).all()


def test_resize_real_gif_bmp_reencodes_as_png(spark):
    """Real GIF/BMP payloads through resize_images (advisor r5): the
    old fall-through re-wrapped them as SYNM blobs while meta still
    claimed gif/bmp. Now they decode for real, bilinear-resample, and
    re-encode as PNG with meta.format saying so — and the output
    pixels equal _resize_bilinear over the independently-verified
    reference pixels, since both source decodes are pixel-exact."""
    import os

    import numpy as np

    if not os.path.exists(f"{IMGDATA}/python.gif"):
        pytest.skip("CPython test images not present")
    from web3_flight_rpc_server_spark.multimodal.media import (
        _codec,
        _resize_bilinear,
    )

    media = spark.createDataFrame(
        [
            (0, "image", open(f"{IMGDATA}/python.gif", "rb").read(), None),
            (1, "image", open(f"{IMGDATA}/python.bmp", "rb").read(), None),
        ],
        MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in resize_images(media, 8, 8).collect()}
    truth = {
        0: _read_ppm(
            f"{__file__.rsplit('/', 1)[0]}/fixtures/python_gif_imageio.ppm"
        ),
        1: _read_ppm(f"{IMGDATA}/python.ppm"),
    }
    _, dec = _codec()
    for i, r in out.items():
        assert r.meta.format == "png"
        assert (r.meta.width, r.meta.height) == (8, 8)
        content = bytes(r.content)
        assert content[:8] == b"\x89PNG\r\n\x1a\n"
        assert r.meta.n_bytes == len(content)
        kind, w, h, _f, payload = dec(content)
        assert (kind, w, h) == ("image", 8, 8)
        got = np.frombuffer(payload, dtype=np.uint8).reshape(8, 8, 3)
        assert (got == _resize_bilinear(truth[i], 8, 8)).all()


def test_probe_media_gif_bmp_webp_dims(spark):
    """Header-only triage covers the palette/RIFF image formats too,
    on real third-party files (incl. the VP8X WebP the full decoder
    has no codec for)."""
    import os

    from web3_flight_rpc_server_spark.multimodal.containers import (
        probe_media,
    )

    names = ["python.gif", "python.bmp", "python.webp"]
    rows = []
    for i, name in enumerate(names):
        p = f"{IMGDATA}/{name}"
        if os.path.exists(p):
            rows.append((i, "image", open(p, "rb").read(), None))
    if not rows:
        pytest.skip("CPython test images not present")
    out = {
        r.media_id: r
        for r in probe_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    fmts = {0: "gif", 1: "bmp", 2: "webp"}
    for i, r in out.items():
        assert (r.format, r.width, r.height) == (fmts[i], 16, 16)


def test_paletted_png_decodes_pixel_exact_vs_lossless_twin(spark):
    """CPython's python.png is 8-bit PALETTED (color type 3): the
    PLTE-mapped decode must match the lossless PPM twin
    byte-for-byte, like the BMP path."""
    import os

    import numpy as np

    if not os.path.exists(f"{IMGDATA}/python.png"):
        pytest.skip("CPython test images not present")
    from web3_flight_rpc_server_spark.multimodal.media import _codec

    _, dec = _codec()
    kind, w, h, _f, payload = dec(open(f"{IMGDATA}/python.png", "rb").read())
    assert (kind, w, h) == ("image", 16, 16)
    truth = _read_ppm(f"{IMGDATA}/python.ppm")
    got = np.frombuffer(payload, dtype=np.uint8).reshape(16, 16, 3)
    assert (got == truth).all()
