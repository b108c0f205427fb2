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
