"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star scope; the reference is text/numbers only).

Design for 100 TB of media:

- content is an opaque ``binary`` column; metadata is a typed struct
  so planning-relevant fields (kind, dims, duration) are columnar and
  filterable WITHOUT touching the payload bytes (predicate pushdown
  + column pruning skip the blobs entirely when a query only needs
  metadata).
- every transform is mapInPandas over Arrow batches: payloads cross
  the JVM<->Python boundary zero-copy-ish in batches, never row at a
  time, and partitioning is preserved (no shuffle is introduced by a
  decode).
- the decode step dispatches on magic bytes. Six REAL formats decode
  with stdlib + numpy: PNG (zlib inflate + per-scanline unfiltering,
  8-bit gray/RGB/RGBA), baseline JPEG (marker parse, Huffman entropy
  decode, dequant + IDCT, triangular chroma upsampling —
  multimodal/jpeg.py, conformance-tested against an independent
  reference decoder on third-party files), GIF (LZW with variable
  code width + de-interlacing, pixel-exact vs the same reference
  decoder), BMP (24/32-bit incl. BI_BITFIELDS, pixel-exact vs a
  lossless third-party twin), and WAV/AIFF (RIFF and FORM PCM via the
  ``wave``/``aifc`` modules) — so real image pixels and real PCM
  samples flow end-to-end through the Arrow path without PIL/av. MP3 parses to metadata (frame count, duration,
  bitrate — multimodal/containers.py) without decoding; formats that
  genuinely need native codecs (progressive JPEG, MP3 synthesis, MP4)
  remain a clearly-marked NotImplementedError, and a deterministic
  synthetic format ("SYNM") exercises the full plumbing — schema,
  batch shapes, UDF signatures, feature extraction — for every kind
  including video.

The SYNM format (synthetic, self-describing, versioned):
    b"SYNM" | kind:1 byte (i/a/v) | width:u16 | height:u16 |
    frames:u16 | payload bytes (seeded per media_id)

Decode tuple conventions, (kind, width, height, n_frames, payload):
    image: width/height in px, n_frames=1, payload = raw pixel bytes
    audio: width = n_channels, height = sample rate (Hz),
           n_frames = PCM frame count, payload = PCM bytes
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

def _codec():
    """(encode, decode) pair built as NESTED functions: mapInPandas
    closures capture them as local objects, so cloudpickle serializes
    them by value and Python workers never need this package on their
    import path (module-level functions are pickled by reference)."""
    magic = b"SYNM"
    kind_code = {"image": b"i", "audio": b"a", "video": b"v"}
    code_kind = {v: k for k, v in kind_code.items()}

    def encode(media_id: int, kind: str, width: int, height: int,
               frames: int) -> bytes:
        rng = np.random.default_rng(media_id)  # deterministic per id
        payload = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
        return (
            magic + kind_code[kind] + struct.pack("<HHH", width, height, frames)
            + payload
        )

    def png_decode(data: bytes) -> tuple[str, int, int, int, bytes]:
        """Stdlib PNG decode: chunk walk, zlib inflate, scanline
        unfilter (None/Sub/Up/Average/Paeth per the PNG spec §9).
        Supports 8-bit depth, color types 0 (gray) / 2 (RGB) /
        3 (paletted — PLTE-mapped to RGB, pixel-exact vs CPython's
        python.png + its lossless PPM twin) / 6 (RGBA),
        non-interlaced — the overwhelmingly common cases.
        Correctness-first reference implementation (pure-Python byte
        loops); unfilter correctness is pinned in tests by decoding a
        filter-0-only twin of a mixed-filter image to identical
        pixels."""
        import zlib

        pos, idat = 8, b""
        width = height = color_type = None
        plte = None
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            ctype = data[pos + 4:pos + 8]
            chunk = data[pos + 8:pos + 8 + length]
            pos += 12 + length  # length + type + payload + crc
            if ctype == b"IHDR":
                (width, height, bit_depth, color_type, _comp, _filt,
                 interlace) = struct.unpack(">IIBBBBB", chunk)
                if bit_depth != 8 or interlace != 0 or \
                        color_type not in (0, 2, 3, 6):
                    raise NotImplementedError(
                        f"PNG bit_depth={bit_depth} color_type="
                        f"{color_type} interlace={interlace}: only "
                        "8-bit gray/RGB/palette/RGBA non-interlaced "
                        "decodes without native libs here"
                    )
            elif ctype == b"PLTE":
                plte = chunk
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
        if width is None:
            raise ValueError("PNG missing IHDR")
        if color_type == 3 and plte is None:
            raise ValueError("paletted PNG missing PLTE")
        raw = zlib.decompress(idat)
        ch = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
        stride = width * ch
        out = bytearray()
        prev = bytearray(stride)
        p = 0
        for _y in range(height):
            f = raw[p]
            line = bytearray(raw[p + 1:p + 1 + stride])
            p += 1 + stride
            if f == 1:  # Sub
                for i in range(ch, stride):
                    line[i] = (line[i] + line[i - ch]) & 0xFF
            elif f == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif f == 3:  # Average
                for i in range(stride):
                    a = line[i - ch] if i >= ch else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for i in range(stride):
                    a = line[i - ch] if i >= ch else 0
                    b = prev[i]
                    c = prev[i - ch] if i >= ch else 0
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    line[i] = (line[i] + pr) & 0xFF
            elif f != 0:
                raise ValueError(f"invalid PNG filter type {f}")
            out += line
            prev = line
        if color_type == 3:  # indexed: map through the palette to RGB
            pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            idx = np.frombuffer(bytes(out), dtype=np.uint8)
            return "image", int(width), int(height), 1, pal[idx].tobytes()
        return "image", int(width), int(height), 1, bytes(out)

    def wav_decode(data: bytes) -> tuple[str, int, int, int, bytes]:
        """Stdlib WAV decode via the ``wave`` module: width carries
        the channel count, height the sample rate (Hz), n_frames the
        PCM frame count; payload is the interleaved PCM bytes."""
        import io
        import wave

        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            rate = w.getframerate()
            n = w.getnframes()
            payload = w.readframes(n)
        return "audio", n_ch, rate, n, payload

    def bmp_decode(data: bytes) -> tuple[str, int, int, int, bytes]:
        """Stdlib+numpy BMP decode: uncompressed 24-bit BI_RGB and
        32-bit BI_RGB/BI_BITFIELDS (byte-aligned masks), bottom-up or
        top-down rows; payload is RGB bytes (alpha dropped). Decodes
        CPython's shipped python.bmp PIXEL-EXACT against its lossless
        PPM twin (tests/test_multimodal.py)."""
        (off,) = struct.unpack("<I", data[10:14])
        w, h_signed = struct.unpack("<ii", data[18:26])
        (bpp,) = struct.unpack("<H", data[28:30])
        (comp,) = struct.unpack("<I", data[30:34])
        top_down = h_signed < 0
        h = abs(h_signed)
        if bpp == 32 and comp in (0, 3):
            if comp == 3:  # BI_BITFIELDS: masks follow the core header
                rmask, gmask, bmask = struct.unpack("<III", data[54:66])
            else:
                rmask, gmask, bmask = 0xFF0000, 0xFF00, 0xFF
            px = np.frombuffer(
                data[off:off + w * h * 4], dtype="<u4"
            ).reshape(h, w)

            def ext(mask: int) -> np.ndarray:
                shift = (mask & -mask).bit_length() - 1
                return ((px & mask) >> shift).astype(np.uint8)

            rgb = np.stack([ext(rmask), ext(gmask), ext(bmask)], axis=-1)
        elif bpp == 24 and comp == 0:
            stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
            rows = np.frombuffer(
                data[off:off + stride * h], dtype=np.uint8
            ).reshape(h, stride)
            rgb = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR->RGB
        else:
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={comp}: only uncompressed "
                "24/32-bit decodes here"
            )
        if not top_down:
            rgb = rgb[::-1]
        return "image", int(w), int(h), 1, np.ascontiguousarray(rgb).tobytes()

    def gif_decode(data: bytes) -> tuple[str, int, int, int, bytes]:
        """Stdlib+numpy GIF decode: logical screen + palettes, LZW
        with variable code width and clear/EOI handling, 4-pass
        de-interlacing; FIRST image block only (animation = repeated
        blocks; frame_sample-style iteration belongs to a caller).
        Extension blocks — including the Graphic Control Extension —
        are SKIPPED: transparency is intentionally ignored, so
        transparent pixels carry their palette color. That matches the
        Java ImageIO reference behavior, and the decode is PIXEL-EXACT
        against it on CPython's python.gif
        (tests/fixtures/python_gif_imageio.ppm)."""
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF")
        w, h = struct.unpack("<HH", data[6:10])
        flags = data[10]
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 ** ((flags & 7) + 1)
            gct = np.frombuffer(
                data[pos:pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        while pos < len(data):
            block = data[pos]
            if block == 0x21:  # extension: skip sub-blocks
                pos += 2
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                _l, _t, iw, ih = struct.unpack("<HHHH", data[pos + 1:pos + 9])
                iflags = data[pos + 9]
                pos += 10
                pal = gct
                if iflags & 0x80:  # local palette
                    n = 2 ** ((iflags & 7) + 1)
                    pal = np.frombuffer(
                        data[pos:pos + 3 * n], dtype=np.uint8
                    ).reshape(n, 3)
                    pos += 3 * n
                if pal is None:
                    raise ValueError("GIF image with no color table")
                min_code = data[pos]
                pos += 1
                lzw = bytearray()
                while data[pos] != 0:
                    sz = data[pos]
                    lzw += data[pos + 1:pos + 1 + sz]
                    pos += 1 + sz
                # LZW: variable code width, dictionary reset on CLEAR
                clear_code = 1 << min_code
                eoi = clear_code + 1
                base = [(i,) for i in range(clear_code)] + [None, None]
                table = list(base)
                code_size = min_code + 1
                out: list[int] = []
                prev = None
                acc = nbits = 0
                for byte in lzw:
                    acc |= byte << nbits
                    nbits += 8
                    while nbits >= code_size:
                        code = acc & ((1 << code_size) - 1)
                        acc >>= code_size
                        nbits -= code_size
                        if code == clear_code:
                            table = list(base)
                            code_size = min_code + 1
                            prev = None
                            continue
                        if code == eoi:
                            acc = nbits = 0
                            break
                        if prev is None:
                            entry = table[code]
                        elif code < len(table):
                            entry = table[code]
                            table.append(prev + (entry[0],))
                        else:  # the KwKwK case
                            entry = prev + (prev[0],)
                            table.append(entry)
                        out.extend(entry)
                        prev = entry
                        if len(table) >= (1 << code_size) and code_size < 12:
                            code_size += 1
                if len(out) < iw * ih:
                    raise ValueError(
                        f"GIF LZW stream ended after {len(out)}/{iw * ih} "
                        "pixels"
                    )
                idx = np.array(out[:iw * ih], dtype=np.int32).reshape(ih, iw)
                if iflags & 0x40:  # 4-pass interlace
                    deint = np.zeros_like(idx)
                    order = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                             + list(range(2, ih, 4)) + list(range(1, ih, 2)))
                    for src_row, dst_row in enumerate(order):
                        deint[dst_row] = idx[src_row]
                    idx = deint
                return "image", int(iw), int(ih), 1, pal[idx].tobytes()
            elif block == 0x3B:  # trailer
                break
            else:
                pos += 1
        raise ValueError("GIF contains no image block")

    def aiff_decode(data: bytes) -> tuple[str, int, int, int, bytes]:
        """Stdlib AIFF/AIFC decode via ``aifc`` (same column
        conventions as WAV); payload is the PCM byte stream AS STORED
        — big-endian for AIFF, unlike WAV's little-endian. Compressed
        AIFC variants raise NotImplementedError."""
        import io
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import aifc

        with aifc.open(io.BytesIO(data), "rb") as a:
            if a.getcomptype() not in (b"NONE",):
                raise NotImplementedError(
                    f"AIFC compression {a.getcomptype()!r}: only "
                    "uncompressed PCM decodes without native libs"
                )
            n_ch = a.getnchannels()
            rate = a.getframerate()
            n = a.getnframes()
            payload = a.readframes(n)
        return "audio", n_ch, rate, n, payload

    def decode(content: bytes) -> tuple[str, int, int, int, bytes]:
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            return png_decode(content)
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            return wav_decode(content)
        if content[:4] == b"FORM" and content[8:12] in (b"AIFF", b"AIFC"):
            return aiff_decode(content)
        if content[:6] in (b"GIF87a", b"GIF89a"):
            return gif_decode(content)
        if content[:2] == b"BM" and len(content) > 54:
            return bmp_decode(content)
        if content[:2] == b"\xff\xd8":
            # Baseline JPEG decodes for real (multimodal/jpeg.py,
            # conformance-tested against an independent reference
            # decoder); progressive raises NotImplementedError at the
            # exact branch. NOTE: unlike the by-value closures above,
            # this path imports the package on the worker — fine
            # wherever the repo is on the workers' python path (all
            # test/driver shapes here); ship the package via
            # spark.submit.pyFiles on a real cluster.
            from web3_flight_rpc_server_spark.multimodal import jpeg

            width, height, px = jpeg.decode_baseline(content)
            return "image", width, height, 1, px.tobytes()
        if content[:4] != magic:
            # MP3/MP4 etc. genuinely need native codec libraries
            # (av / soundfile), which this environment lacks.
            raise NotImplementedError(
                "only PNG, baseline JPEG, WAV and the SYNM synthetic "
                "format decode without native codec libraries (av) in "
                "this build"
            )
        kind = code_kind[content[4:5]]
        width, height, frames = struct.unpack("<HHH", content[5:11])
        return kind, width, height, frames, content[11:]

    return encode, decode


def synthesize_media(spark: SparkSession, n: int = 100,
                     partitions: int = 8) -> DataFrame:
    """Distributed deterministic media corpus: id -> SYNM blob. Uses
    mapInPandas over a range (no driver-side generation, scales to any
    n). Kinds cycle image/audio/video; dims derive from the id."""

    _synm_encode, _ = _codec()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for media_id in pdf["id"]:
                media_id = int(media_id)
                kind = kinds[media_id % 3]
                width = 16 + (media_id % 8) * 4
                height = 16 + (media_id % 5) * 4
                frames = 1 if kind == "image" else 4 + media_id % 4
                content = _synm_encode(media_id, kind, width, height, frames)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "content": content,
                        "meta": {
                            "format": "synm",
                            "width": width,
                            "height": height,
                            "n_frames": frames,
                            "n_bytes": len(content),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("decoded_kind", T.StringType(), True),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("payload_len", T.LongType(), True),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Parse/validate the binary payload per row (Arrow-batched;
    partition-preserving). Real codecs are stubbed — see module doc."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    _, _synm_decode = _codec()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, widths, heights, lens = [], [], [], []
            for content in pdf["content"]:
                kind, width, height, _frames, payload = _synm_decode(bytes(content))
                kinds.append(kind)
                widths.append(width)
                heights.append(height)
                lens.append(len(payload))
            yield pdf.assign(
                decoded_kind=kinds,
                decoded_width=widths,
                decoded_height=heights,
                payload_len=lens,
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "media_id bigint, kind string, features array<float>"


def byte_histogram_features(media: DataFrame, bins: int = 64) -> DataFrame:
    """Feature extraction that is fully REAL (no codec needed): an
    L1-normalized byte histogram of the payload -> array<float>,
    directly usable by the similarity operators (cosine top-k / LSH)."""

    _, _synm_decode = _codec()

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                _k, _w, _h, _f, payload = _synm_decode(bytes(content))
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)


def _resize_bilinear(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """(h, w, c) uint8 -> (height, width, c) uint8, bilinear."""
    h, w = px.shape[:2]
    ys = np.linspace(0, h - 1, height)
    xs = np.linspace(0, w - 1, width)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    p = px.astype(np.float64)
    out = (
        p[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + p[np.ix_(y0, x1)] * (1 - fy) * fx
        + p[np.ix_(y1, x0)] * fy * (1 - fx)
        + p[np.ix_(y1, x1)] * fy * fx
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _png_encode(px: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit gray/RGB/RGBA, filter 0, one IDAT."""
    import zlib

    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — REAL for PNG, baseline JPEG, GIF and BMP
    payloads (decode, numpy bilinear resample, re-encode: JPEG stays
    JPEG; PNG/GIF/BMP re-encode as PNG — GIF palettes and BMP row
    layouts have no lossless writer here, and meta.format records the
    new container); SYNM blobs keep the deterministic payload
    re-sampling. Non-image rows pass through untouched. Like the JPEG
    decode path, the real-format branches import the package on the
    worker (shipped via session.ensure_package_on_workers — the
    local-mode twin of spark.submit.pyFiles); the SYNM path stays
    fully by-value."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    _synm_encode_unused, _synm_decode = _codec()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar batch processing: the per-payload decode is
        # inherently row-wise (variable-length opaque blobs), but the
        # output is assembled as whole columns on a copied frame — no
        # iterrows, no per-row dict materialization
        for pdf in batches:
            contents = []
            metas = []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                data = bytes(content)
                if data[:2] == b"\xff\xd8":
                    from web3_flight_rpc_server_spark.multimodal import (
                        jpeg,
                        media as _m,
                    )

                    _w, _h, px = jpeg.decode_baseline(data)
                    resized = _m._resize_bilinear(px, width, height)
                    new_content = jpeg.encode_baseline(resized, quality=90)
                    contents.append(new_content)
                    metas.append({
                        "format": "jpeg", "width": width,
                        "height": height, "n_frames": 1,
                        "n_bytes": len(new_content),
                    })
                    continue
                is_png = data[:8] == b"\x89PNG\r\n\x1a\n"
                is_gif = data[:6] in (b"GIF87a", b"GIF89a")
                is_bmp = data[:2] == b"BM" and len(data) > 54
                if is_png or is_gif or is_bmp:
                    # GIF/BMP decode to RGB pixels for real (the shared
                    # decode dispatcher) and re-encode as PNG — their
                    # palettes/row layouts have no lossless writer
                    # here, and meta.format says so (advisor r5: the
                    # old fall-through re-wrapped them as SYNM blobs
                    # while meta still claimed gif/bmp).
                    from web3_flight_rpc_server_spark.multimodal import (
                        media as _m,
                    )

                    _k, _w, _h, _f, payload = _synm_decode(data)
                    ch = len(payload) // (_w * _h)
                    px = np.frombuffer(
                        payload, dtype=np.uint8
                    ).reshape(_h, _w, ch)
                    resized = _m._resize_bilinear(px, width, height)
                    new_content = _m._png_encode(resized)
                    contents.append(new_content)
                    metas.append({
                        "format": "png", "width": width,
                        "height": height, "n_frames": 1,
                        "n_bytes": len(new_content),
                    })
                    continue
                kind, _w, _h, frames, payload = _synm_decode(data)
                if kind != "image":
                    contents.append(content)
                    metas.append(meta)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                idx = np.linspace(0, len(arr) - 1, width * height).astype(int)
                new_content = (
                    b"SYNM" + b"i"
                    + struct.pack("<HHH", width, height, frames)
                    + arr[idx].tobytes()
                )
                contents.append(new_content)
                metas.append(
                    {**meta, "width": width, "height": height,
                     "n_bytes": len(new_content)}
                )
            out = pdf.copy()
            out["content"] = contents
            out["meta"] = metas
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every n-th frame of video payloads into one row per
    frame (a row explosion done batch-wise in Python, the shape a real
    demuxer stub would have)."""

    _, _synm_decode = _codec()

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames_out = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                kind, _w, _h, n_frames, payload = _synm_decode(bytes(content))
                if kind != "video" or n_frames == 0:
                    continue
                frame_len = max(len(payload) // n_frames, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(media_id)
                    idxs.append(i)
                    frames_out.append(payload[i * frame_len:(i + 1) * frame_len])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames_out}
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        sample, schema=FRAMES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, rms double, "
    "dominant_freq_hz double, spectral_centroid_hz double, "
    "zero_crossing_rate double"
)


def _pcm_mono(data: bytes) -> "tuple[np.ndarray, int] | None":
    """Mono float64 PCM in [-1, 1] plus sample rate, from WAV or AIFF
    bytes via the stdlib codecs; None when the magic is neither
    RIFF/WAVE nor FORM/AIFF(-C). Malformed or unsupported payloads
    RAISE (wave.Error, NotImplementedError for >16-bit / compressed
    AIFC, ...) — callers choose between honesty (audio_features) and
    triage-drop (the fingerprint pass). Shared by audio_features and
    multimodal/neardup.py so both passes hear the same signal."""
    import io
    import wave as _wave

    is_wav = data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    is_aiff = data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC")
    if not (is_wav or is_aiff):
        return None
    if is_wav:
        with _wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            rate = w.getframerate()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        endian = "<"
    else:
        import warnings as _warnings

        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore", DeprecationWarning)
            import aifc as _aifc
        with _aifc.open(io.BytesIO(data), "rb") as a:
            if a.getcomptype() != b"NONE":
                raise NotImplementedError(
                    f"AIFC compression {a.getcomptype()!r}"
                )
            n_ch = a.getnchannels()
            rate = a.getframerate()
            width = a.getsampwidth()
            raw = a.readframes(a.getnframes())
        endian = ">"  # AIFF PCM is big-endian
    if width == 2:
        pcm = np.frombuffer(raw, dtype=endian + "i2").astype(np.float64)
        pcm /= 32768.0
    elif width == 1:  # 8-bit WAV is unsigned; AIFF signed
        if is_wav:
            pcm = (np.frombuffer(raw, dtype=np.uint8)
                   .astype(np.float64) - 128.0) / 128.0
        else:
            pcm = np.frombuffer(raw, dtype=np.int8).astype(np.float64)
            pcm /= 128.0
    else:
        raise NotImplementedError(
            f"{8 * width}-bit PCM (only 8/16-bit here)"
        )
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    return pcm, rate


def audio_features(media: DataFrame) -> DataFrame:
    """Real signal features from WAV payloads (numpy FFT — no codec
    libs): normalized RMS energy, dominant frequency (argmax of the
    rFFT magnitude, DC excluded), spectral centroid, and zero-crossing
    rate. These are the cheap gates an audio curation pipeline filters
    on before any expensive model runs — silence (rms ~ 0), test
    tones (centroid == dominant), clipped/noisy captures (high ZCR
    with flat spectrum). Rows whose payload is not RIFF/WAVE are
    skipped (SYNM audio has no meaningful sample semantics). The
    closure reaches module-level _pcm_mono, so the package ships to
    workers like the other real-decode paths."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "sample_rate": [], "n_samples": [],
                "rms": [], "dominant_freq_hz": [],
                "spectral_centroid_hz": [], "zero_crossing_rate": [],
            }
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                loaded = _pcm_mono(bytes(content))
                if loaded is None:
                    continue
                pcm, rate = loaded
                if pcm.size == 0:
                    continue
                mag = np.abs(np.fft.rfft(pcm))
                freqs = np.fft.rfftfreq(pcm.size, d=1.0 / rate)
                ac = mag.copy()
                ac[0] = 0.0  # exclude DC from the dominant pick
                dom = float(freqs[int(ac.argmax())]) if ac.any() else 0.0
                tot = float(ac.sum())
                centroid = float((freqs * ac).sum() / tot) if tot else 0.0
                zc = float(
                    (np.diff(np.signbit(pcm)) != 0).mean()
                ) if pcm.size > 1 else 0.0
                rows["media_id"].append(media_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(int(pcm.size))
                rows["rms"].append(float(np.sqrt((pcm ** 2).mean())))
                rows["dominant_freq_hz"].append(dom)
                rows["spectral_centroid_hz"].append(centroid)
                rows["zero_crossing_rate"].append(zc)
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(
        featurize, schema=AUDIO_FEATURES_SCHEMA
    )
