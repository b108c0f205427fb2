"""Generate the committed media fixtures under tests/fixtures/:

- gradient_f0.png     8x5 RGB gradient, every scanline filter 0
- gradient_mixed.png  SAME pixels, scanline filters 1,2,3,4,2
- tone.wav            16-bit mono PCM, 8 kHz, 64-sample square-ish tone

The two PNGs carry identical pixel content under different filter
encodings: filter 0 is trivially correct to decode, so the decoder's
Sub/Up/Average/Paeth unfiltering is validated by decoding both to
identical bytes (tests/test_multimodal.py) — an in-repo check that
does not depend on the encoder and decoder sharing filter bugs.

Run from the repo root: python tools/make_media_fixtures.py
"""

from __future__ import annotations

import os
import struct
import wave
import zlib

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

W, H, CH = 8, 5, 3


def pixels() -> list[bytes]:
    """Deterministic RGB scanlines with enough variation that a wrong
    unfilter cannot accidentally reproduce them."""
    rows = []
    for y in range(H):
        row = bytearray()
        for x in range(W):
            row += bytes([(x * 31 + y * 7) % 256,
                          (x * 5 + y * 53) % 256,
                          (x * x + y * 11) % 256])
        rows.append(bytes(row))
    return rows


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def _filter_row(ftype: int, row: bytes, prev: bytes) -> bytes:
    """Apply a PNG filter (spec §9) to one scanline."""
    out = bytearray([ftype])
    for i, x in enumerate(row):
        a = row[i - CH] if i >= CH else 0
        b = prev[i]
        c = prev[i - CH] if i >= CH else 0
        if ftype == 0:
            out.append(x)
        elif ftype == 1:
            out.append((x - a) & 0xFF)
        elif ftype == 2:
            out.append((x - b) & 0xFF)
        elif ftype == 3:
            out.append((x - (a + b) // 2) & 0xFF)
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((x - pr) & 0xFF)
        else:
            raise ValueError(ftype)
    return bytes(out)


def write_png(path: str, filters: list[int]) -> None:
    rows = pixels()
    raw = b""
    prev = bytes(W * CH)
    for row, f in zip(rows, filters):
        raw += _filter_row(f, row, prev)
        prev = row
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)  # 8-bit RGB
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(_chunk(b"IHDR", ihdr))
        fh.write(_chunk(b"IDAT", zlib.compress(raw)))
        fh.write(_chunk(b"IEND", b""))


def write_wav(path: str) -> None:
    frames = bytearray()
    for i in range(64):
        v = 12000 if (i // 8) % 2 == 0 else -12000
        frames += struct.pack("<h", v)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(frames))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    write_png(os.path.join(OUT, "gradient_f0.png"), [0] * H)
    write_png(os.path.join(OUT, "gradient_mixed.png"), [1, 2, 3, 4, 2])
    write_wav(os.path.join(OUT, "tone.wav"))
    print("wrote fixtures to", OUT)


if __name__ == "__main__":
    main()
