"""Container/metadata parsing for audio formats that need native
codecs to DECODE but not to DESCRIBE.

At 100 TB the first pass over a media corpus is metadata triage —
drop the 9-hour recordings, the 8 kHz phone captures, the zero-length
uploads — and none of that needs a single decoded sample. MP3 frame
headers are plain bitfields (ISO 11172-3 frame sync + bitrate /
sample-rate indices), so duration, bitrate profile and frame count
parse with stdlib byte walking even though Layer-III synthesis stays
NotImplementedError in the decode path (multimodal/media.py).

Conformance: parsed against the real-world MP3 that ships with this
environment's gsutil test data (tests/test_multimodal.py) — frame
count, sample rate and the duration/bitrate/size identity are checked
against each other, not against a synthesized-by-us file.
"""

from __future__ import annotations

# MPEG audio Layer III tables (ISO 11172-3 / 13818-3): kbps by
# (version-group, bitrate_index) and Hz by (version, samplerate_index)
_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112,
                  128, 160, 192, 224, 256, 320]
_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64,
                  80, 96, 112, 128, 144, 160]
_RATES = {
    3: [44100, 48000, 32000],   # MPEG1
    2: [22050, 24000, 16000],   # MPEG2
    0: [11025, 12000, 8000],    # MPEG2.5
}


def mp3_metadata(data: bytes) -> dict:
    """Walk the MP3 frame headers. Returns {n_frames, sample_rate,
    duration_s, avg_bitrate_kbps, has_id3} — raises ValueError when no
    valid Layer-III frame sequence is found (so corrupt uploads
    surface instead of reporting zero-duration audio)."""
    pos = 0
    has_id3 = data[:3] == b"ID3"
    if has_id3:
        # ID3v2 size is syncsafe (7 bits per byte), header is 10 bytes
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + size
    n_frames = 0
    samples = 0.0
    bits = 0
    sample_rate = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
            if n_frames:  # trailing tag/garbage after the last frame
                break
            pos += 1  # scan for the first sync
            continue
        version = (data[pos + 1] >> 3) & 0x03   # 3=MPEG1 2=MPEG2 0=2.5
        layer = (data[pos + 1] >> 1) & 0x03     # 1 = Layer III
        br_idx = (data[pos + 2] >> 4) & 0x0F
        sr_idx = (data[pos + 2] >> 2) & 0x03
        padding = (data[pos + 2] >> 1) & 0x01
        if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            if n_frames:
                break
            pos += 1
            continue
        rate = _RATES[version][sr_idx]
        kbps = (_BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3)[br_idx]
        spf = 1152 if version == 3 else 576  # samples per L3 frame
        frame_len = (spf // 8) * kbps * 1000 // rate + padding
        if frame_len <= 4:
            break
        if sample_rate is None:
            sample_rate = rate
        n_frames += 1
        samples += spf
        bits += frame_len * 8
        pos += frame_len
    if not n_frames or sample_rate is None:
        raise ValueError("no valid MP3 Layer-III frames found")
    duration = samples / sample_rate
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "duration_s": round(duration, 3),
        "avg_bitrate_kbps": round(bits / duration / 1000.0, 1),
        "has_id3": has_id3,
    }


def mp4_metadata(data: bytes) -> dict:
    """ISO-BMFF (MP4/MOV) box walk — ISO 14496-12 structure only, no
    sample decoding: top-level boxes to ``moov``, then ``mvhd`` for
    timescale/duration and the first ``trak``'s ``tkhd`` for display
    dims (16.16 fixed point). Returns {duration_s, width, height,
    brand}; raises ValueError when the box structure is absent/broken.

    No real MP4 ships in this environment, so the test fixture is a
    synthesized minimal box tree (tests/test_multimodal.py notes
    this explicitly) — unlike the MP3/JPEG/AIFF paths, conformance
    here is structural, not cross-decoder."""
    import struct as _s

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = _s.unpack(">I", buf[pos:pos + 4])
            btype = buf[pos + 4:pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                (size,) = _s.unpack(">Q", buf[pos + 8:pos + 16])
                hdr = 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("broken MP4 box structure")
            yield btype, pos + hdr, pos + size
            pos += size

    if len(data) < 16 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    brand = data[8:12].decode("ascii", "replace")
    duration_s = None
    width = height = None
    for btype, b0, b1 in walk(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ityp, i0, i1 in walk(data, b0, b1):
            if ityp == b"mvhd":
                ver = data[i0]
                if ver == 1:
                    timescale, = _s.unpack(">I", data[i0 + 20:i0 + 24])
                    dur, = _s.unpack(">Q", data[i0 + 24:i0 + 32])
                else:
                    timescale, = _s.unpack(">I", data[i0 + 12:i0 + 16])
                    dur, = _s.unpack(">I", data[i0 + 16:i0 + 20])
                if timescale:
                    duration_s = round(dur / timescale, 3)
            elif ityp == b"trak" and width is None:
                for ttyp, t0, t1 in walk(data, i0, i1):
                    if ttyp == b"tkhd":
                        # width/height: last 8 bytes, 16.16 fixed
                        w_fx, h_fx = _s.unpack(">II", data[t1 - 8:t1])
                        if w_fx and h_fx:
                            width, height = w_fx >> 16, h_fx >> 16
    if duration_s is None:
        raise ValueError("MP4 missing moov/mvhd")
    return {"brand": brand, "duration_s": duration_s,
            "width": width, "height": height}


PROBE_SCHEMA = (
    "media_id bigint, format string, width int, height int, "
    "duration_s double, sample_rate int, n_channels int, "
    "n_frames int, bitrate_kbps double"
)


def probe_media(media):
    """HEADER-ONLY metadata triage across every format the engine
    knows — the first pass a 100 TB media corpus runs, before any
    decode: JPEG dims come from the SOF marker (no entropy decode),
    PNG from IHDR, WAV/AIFF from the container header, MP3 from the
    frame-header walk, MP4 from the box tree, SYNM from its header.
    Unknown payloads surface as format='unknown' rows rather than
    errors (triage must not die on one corrupt upload). Each field is
    null where the format has no such concept.

    The probe closure reaches module-level mp3_metadata/mp4_metadata,
    so the package ships to workers first (UDFs capture the
    python-includes list at CREATION — shipping later doesn't reach
    already-built plans)."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    import struct as _s
    from typing import Iterator

    import pandas as pd

    def probe_one(data: bytes) -> dict:
        out = {"format": "unknown", "width": None, "height": None,
               "duration_s": None, "sample_rate": None,
               "n_channels": None, "n_frames": None,
               "bitrate_kbps": None}
        try:
            if data[:8] == b"\x89PNG\r\n\x1a\n":
                w, h = _s.unpack(">II", data[16:24])
                out.update(format="png", width=w, height=h, n_frames=1)
            elif data[:2] == b"\xff\xd8":
                i = 2
                while i + 9 < len(data):
                    if data[i] != 0xFF:
                        i += 1
                        continue
                    m = data[i + 1]
                    if m in (0xFF, 0x01) or 0xD0 <= m <= 0xD9:
                        i += 2 if m != 0xFF else 1
                        continue
                    ln, = _s.unpack(">H", data[i + 2:i + 4])
                    if m in (0xC0, 0xC1, 0xC2):
                        h, w = _s.unpack(">HH", data[i + 5:i + 9])
                        out.update(
                            format="jpeg-progressive" if m == 0xC2
                            else "jpeg", width=w, height=h, n_frames=1,
                        )
                        break
                    i += 2 + ln
            elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                import io
                import wave

                with wave.open(io.BytesIO(data), "rb") as w:
                    out.update(
                        format="wav", sample_rate=w.getframerate(),
                        n_channels=w.getnchannels(),
                        n_frames=w.getnframes(),
                        duration_s=round(
                            w.getnframes() / w.getframerate(), 3
                        ) if w.getframerate() else None,
                    )
            elif data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
                import io
                import warnings

                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", DeprecationWarning)
                    import aifc
                with aifc.open(io.BytesIO(data), "rb") as a:
                    out.update(
                        format="aiff", sample_rate=a.getframerate(),
                        n_channels=a.getnchannels(),
                        n_frames=a.getnframes(),
                        duration_s=round(
                            a.getnframes() / a.getframerate(), 3
                        ) if a.getframerate() else None,
                    )
            elif data[:3] == b"ID3" or (
                len(data) > 2 and data[0] == 0xFF
                and (data[1] & 0xE0) == 0xE0
            ):
                m = mp3_metadata(data)
                out.update(
                    format="mp3", sample_rate=m["sample_rate"],
                    n_frames=m["n_frames"],
                    duration_s=m["duration_s"],
                    bitrate_kbps=m["avg_bitrate_kbps"],
                )
            elif len(data) >= 12 and data[4:8] == b"ftyp":
                m = mp4_metadata(data)
                out.update(
                    format="mp4", width=m["width"], height=m["height"],
                    duration_s=m["duration_s"],
                )
            elif data[:6] in (b"GIF87a", b"GIF89a"):
                w, h = _s.unpack("<HH", data[6:10])
                out.update(format="gif", width=w, height=h)
            elif data[:2] == b"BM" and len(data) > 26:
                w, h = _s.unpack("<ii", data[18:26])
                out.update(format="bmp", width=w, height=abs(h),
                           n_frames=1)
            elif data[:4] == b"RIFF" and data[8:12] == b"WEBP":
                chunk = data[12:16]
                if chunk == b"VP8X":
                    w = 1 + int.from_bytes(data[24:27], "little")
                    h = 1 + int.from_bytes(data[27:30], "little")
                    out.update(format="webp", width=w, height=h)
                elif chunk == b"VP8L":
                    bits = int.from_bytes(data[21:25], "little")
                    out.update(
                        format="webp",
                        width=(bits & 0x3FFF) + 1,
                        height=((bits >> 14) & 0x3FFF) + 1,
                    )
                elif chunk == b"VP8 ":
                    w, h = _s.unpack("<HH", data[26:30])
                    out.update(format="webp", width=w & 0x3FFF,
                               height=h & 0x3FFF)
                else:
                    out.update(format="webp")
            elif data[:4] == b"SYNM":
                w, h, f = _s.unpack("<HHH", data[5:11])
                out.update(format="synm", width=w, height=h, n_frames=f)
        except Exception:
            pass  # triage: corrupt payloads stay format='unknown'
        return out

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [probe_one(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(probe, schema=PROBE_SCHEMA)
