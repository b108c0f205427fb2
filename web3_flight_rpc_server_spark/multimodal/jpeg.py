"""Baseline JPEG codec, stdlib + numpy only (no PIL/libjpeg).

Round 4 left JPEG as an honest ``NotImplementedError`` ("needs native
codecs"); this module removes that caveat for the overwhelmingly
common case: **baseline sequential DCT** (SOF0/SOF1), 8-bit, 1 or 3
components, any 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers —
the format ~all camera/web JPEGs use. Progressive (SOF2), arithmetic
coding, 12-bit, and CMYK stay NotImplementedError, stated at the
exact branch.

Conformance is tested against third-party files this environment
already ships (no network, nothing synthesized by this repo):
CPython's 16x16 ``python.jpg`` decoded against the EXACT pixels of
its sibling ``python.ppm`` (independent encoder, independent format),
Spark's bundled kitten photos (baseline 4:2:0), and requests'
``flower-of-life.jpg`` (4:4:4) — see tests/test_jpeg.py.

The encoder exists primarily to cross-verify the decoder on arbitrary
synthetic images (forward DCT + emitted Huffman tables are written
against the spec independently of the decode path) and to give the
multimodal pipeline a real image WRITER; it emits baseline 4:4:4 with
per-image single-length Huffman tables (valid per the DHT contract,
mildly larger files than the Annex K defaults — simplicity over
ratio).

Reference: ITU-T T.81 (the public JPEG spec); no code derived from
libjpeg or the reference repo (which has no media surface at all).
Performance note: entropy decode is a Python bit loop — correctness-
first, like the PNG unfilter path (multimodal/media.py); fixture-
scale images decode in well under a second.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index k -> natural (row-major) position in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: A[u, x] = c(u) cos((2x+1)u pi/16),
# c(0)=sqrt(1/8), else sqrt(2/8). Forward: F = A f A^T; inverse:
# f = A^T F A. Round-trip identity is pinned numerically in tests.
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _A[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16.0) * (
            np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _HuffTable:
    """Canonical JPEG Huffman table from the DHT (bits, values) lists:
    codes of each length are assigned counting up, shifted left when
    the length grows (T.81 Annex C)."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # past the end: T.81 F.2.2.5 pads with 1-bits
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to the signed
    coefficient value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_baseline(data: bytes):
    """Decode a baseline JPEG. Returns (width, height, pixels) where
    pixels is uint8 of shape (height, width, 3) for YCbCr images and
    (height, width, 1) for grayscale."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    restart_interval = 0
    frame = None
    scan = None
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", data[i + 2:i + 4])
        seg = data[i + 4:i + 2 + seg_len]
        nxt = i + 2 + seg_len
        if marker == 0xDB:  # DQT, possibly several tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline(+ext) Huffman
            precision, h_img, w_img, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG (only 8-bit baseline here)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": w_img, "h": h_img, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2): only baseline sequential "
                "decodes here"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x}: only baseline "
                "sequential (SOF0/SOF1) decodes here"
            )
        elif marker == 0xC4:  # DHT, possibly several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = seg[p + 17:p + 17 + n]
                huff[(tc, th)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: scan header then entropy data
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + c * 2], seg[2 + c * 2]
                scan.append(
                    {"id": cs, "dc": tables >> 4, "ac": tables & 15}
                )
            i = nxt
            break
        i = nxt
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    if len(frame["comps"]) not in (1, 3):
        raise NotImplementedError(
            f"{len(frame['comps'])}-component JPEG (CMYK?): only "
            "grayscale and YCbCr decode here"
        )
    # A legal baseline JPEG may carry MULTIPLE SOS scans (one per
    # component); marker parsing stops at the first, so if that scan
    # does not cover every frame component the decode below would die
    # with a bare KeyError — raise the module's honest marker instead.
    scan_ids = {s["id"] for s in scan}
    if not {c["id"] for c in frame["comps"]} <= scan_ids:
        raise NotImplementedError(
            "multi-scan baseline JPEG (first SOS covers components "
            f"{sorted(scan_ids)} of frame "
            f"{sorted(c['id'] for c in frame['comps'])}): only a "
            "single interleaved scan decodes here"
        )

    # split entropy data into restart segments, unstuffing FF00
    segments: list[bytes] = []
    cur = bytearray()
    while i < len(data) - 1:
        b = data[i]
        if b == 0xFF:
            m = data[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    w_img, h_img = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                 dtype=np.float64)
        for c in comps
    ]
    scan_by_id = {s["id"]: s for s in scan}

    n_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    for seg_bytes in segments:
        reader = _BitReader(seg_bytes)
        preds = [0] * len(comps)
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, comp in enumerate(comps):
                s = scan_by_id[comp["id"]]
                dc_t = huff[(0, s["dc"])]
                ac_t = huff[(1, s["ac"])]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        ssss = reader.decode(dc_t)
                        preds[ci] += _extend(reader.receive(ssss), ssss)
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC run past block end"
                                )
                            coef[ZIGZAG[k]] = _extend(
                                reader.receive(size), size
                            )
                            k += 1
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError(
            f"JPEG entropy data ended after {mcu}/{n_mcus} MCUs"
        )

    # upsample each plane to full MCU-grid resolution, crop to image.
    # Factor-2 axes use triangular (centered bilinear) interpolation —
    # out[2i] = (3 p[i] + p[i-1]) / 4, out[2i+1] = (3 p[i] + p[i+1])/4
    # with edge clamping — the classic h2v2 "fancy upsampling" phase;
    # nearest-neighbor np.repeat measured ~2x the chroma RMSE against
    # the PPM ground truth on the 4:2:0 fixtures. Other factors fall
    # back to repeat.
    def _up2(p: np.ndarray, axis: int) -> np.ndarray:
        near = np.repeat(p, 2, axis=axis)
        lo = np.roll(p, 1, axis=axis)
        hi = np.roll(p, -1, axis=axis)
        if axis == 0:
            lo[0, :] = p[0, :]
            hi[-1, :] = p[-1, :]
        else:
            lo[:, 0] = p[:, 0]
            hi[:, -1] = p[:, -1]
        far = np.empty_like(near)
        sl_even = [slice(None)] * 2
        sl_odd = [slice(None)] * 2
        sl_even[axis] = slice(0, None, 2)
        sl_odd[axis] = slice(1, None, 2)
        far[tuple(sl_even)] = lo
        far[tuple(sl_odd)] = hi
        return (3.0 * near + far) / 4.0

    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        p = _up2(p, 0) if fy == 2 else np.repeat(p, fy, axis=0)
        p = _up2(p, 1) if fx == 2 else np.repeat(p, fx, axis=1)
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        gray = np.clip(full[0], 0, 255).astype(np.uint8)
        return w_img, h_img, gray[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    return w_img, h_img, rgb


# ---------------------------------------------------------------- encode

# IJG base quantization tables (T.81 Annex K.1 — spec example tables,
# not code), natural (row-major) order.
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | (
                (1 << (8 - self.nbits)) - 1  # pad with 1-bits
            )
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _flat_huffman(symbols: list[int]):
    """A valid single-length canonical Huffman table over the used
    symbols: all codes get length L = ceil(log2(n+1)), which leaves
    the all-ones code of length L unassigned (so padding 1-bits can
    never decode as a symbol). Returns (bits16, values, {sym:
    (code, length)})."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = max(1, (n).bit_length())  # 2^length >= n+1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    codes = {s: (idx, length) for idx, s in enumerate(syms)}
    return bits, bytes(syms), codes


def _category(v: int) -> int:
    return abs(v).bit_length()


def encode_baseline(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) or (h, w) / (h, w, 1) uint8 array as a
    baseline 4:4:4 JPEG (grayscale for single-channel input)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h_img, w_img, nch = pixels.shape
    if nch == 3:
        rgb = pixels.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        chans = [y, cb, cr]
    elif nch == 1:
        chans = [pixels[..., 0].astype(np.float64)]
    else:
        raise ValueError(f"expected 1 or 3 channels, got {nch}")

    q_tabs = [_scaled_q(_Q_LUMA, quality)]
    if nch == 3:
        q_tabs.append(_scaled_q(_Q_CHROMA, quality))

    # pad to 8-multiples by edge replication, quantize all blocks
    bw = -(-w_img // 8) * 8
    bh = -(-h_img // 8) * 8
    comp_blocks: list[list[np.ndarray]] = []
    for ci, ch in enumerate(chans):
        q = q_tabs[min(ci, len(q_tabs) - 1)]
        padded = np.pad(
            ch, ((0, bh - h_img), (0, bw - w_img)), mode="edge"
        ) - 128.0
        blocks = []
        for by in range(bh // 8):
            for bx in range(bw // 8):
                f = _fdct2(padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8])
                # zigzag order: element k is natural[ZIGZAG[k]]
                blocks.append(
                    np.round(f / q).astype(np.int32).reshape(64)[ZIGZAG]
                )
        comp_blocks.append(blocks)

    # gather symbols for the (per-image) Huffman tables
    def block_symbols(blocks: list[np.ndarray]):
        dcs, acs, prev = [], [], 0
        for zz in blocks:
            diff = int(zz[0]) - prev
            prev = int(zz[0])
            dcs.append(_category(diff))
            k, run = 1, 0
            while k < 64:
                v = int(zz[k])
                if v == 0:
                    run += 1
                else:
                    while run > 15:
                        acs.append(0xF0)
                        run -= 16
                    acs.append((run << 4) | _category(v))
                    run = 0
                k += 1
            if run:
                acs.append(0x00)
        return dcs, acs

    luma_dc, luma_ac = block_symbols(comp_blocks[0])
    tables = {("dc", 0): luma_dc or [0], ("ac", 0): luma_ac or [0]}
    if nch == 3:
        ch_dc, ch_ac = [], []
        for blocks in comp_blocks[1:]:
            d, a = block_symbols(blocks)
            ch_dc += d
            ch_ac += a
        tables[("dc", 1)] = ch_dc or [0]
        tables[("ac", 1)] = ch_ac or [0]
    huffs = {key: _flat_huffman(syms) for key, syms in tables.items()}

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    for tq, q in enumerate(q_tabs):
        zz = q.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in zz)
    # SOF0
    nc = 1 if nch == 1 else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8,
                                     h_img, w_img, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, min(c, len(q_tabs) - 1)])
    # DHT
    for (cls, tid), (bits, vals, _codes) in huffs.items():
        tc = 0 if cls == "dc" else 1
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | tid]) + bytes(bits) + vals
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        tid = min(c, 1) if nch == 3 else 0
        out += bytes([c + 1, (tid << 4) | tid])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    writer = _BitWriter()
    n_blocks = len(comp_blocks[0])
    preds = [0] * nc
    for bi in range(n_blocks):
        for ci in range(nc):
            zz = comp_blocks[ci][bi]
            tid = min(ci, 1) if nch == 3 else 0
            _, _, dc_codes = huffs[("dc", tid)]
            _, _, ac_codes = huffs[("ac", tid)]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            s = _category(diff)
            code, length = dc_codes[s]
            writer.write(code, length)
            if s:
                writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            k, run = 1, 0
            while k < 64:
                v = int(zz[k])
                if v == 0:
                    run += 1
                else:
                    while run > 15:
                        code, length = ac_codes[0xF0]
                        writer.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_codes[(run << 4) | s]
                    writer.write(code, length)
                    writer.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                k += 1
            if run:
                code, length = ac_codes[0x00]
                writer.write(code, length)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
