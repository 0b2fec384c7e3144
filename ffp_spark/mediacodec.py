"""Pure-Python media codecs for the multimodal operators.

No PIL/ffmpeg ships in this environment, but several real decodes need
only the stdlib:

* PNG — full pixel decode for non-interlaced 8-bit RGB/RGBA (zlib
  inflate + per-row unfilter, filters 0-4 per the PNG spec), plus a
  minimal encoder (filter 0) used by the synthetic corpus.
* JPEG — dimensions from the SOF0/SOF1/SOF2 frame header (pixel decode
  would need libjpeg; that seam stays stubbed in multimodal.py).
* GIF — logical-screen dimensions.
* WAV — full PCM sample decode via struct (rate/channels/width/samples).
* MP4 — duration from the moov/mvhd box (ISO BMFF box walk).

Everything is deterministic byte parsing — no wall clock, no randomness.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(rgb: np.ndarray) -> bytes:
    """Minimal real PNG: 8-bit RGB, no interlace, filter 0 per row."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_dims(payload: bytes) -> Optional[tuple[int, int]]:
    if len(payload) < 24 or not payload.startswith(_PNG_SIG):
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real PNG pixel decode: 8-bit RGB/RGBA, non-interlaced, filters 0-4.
    Returns (width, height, (h, w, channels) uint8 array)."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("png_decode supports 8-bit non-interlaced only")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if width is None or channels is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                upleft = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), upleft)) & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return int(width), int(height), out.reshape(height, width, channels)


# ---------------------------------------------------------------------------
# JPEG / GIF headers
# ---------------------------------------------------------------------------

def jpeg_dims(payload: bytes) -> Optional[tuple[int, int]]:
    """Width/height from the first SOF0/SOF1/SOF2 frame header."""
    if len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # the spec allows 0xFF fill bytes before any marker — skip them
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            if pos + 9 <= n:
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return int(w), int(h)
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            return None
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        pos += 2 + seglen
    return None


def jpeg_header(width: int, height: int) -> bytes:
    """A JPEG prefix with a valid SOF0 carrying the given dimensions
    (entropy-coded data is NOT valid — header-probe testing only)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0


def gif_dims(payload: bytes) -> Optional[tuple[int, int]]:
    if len(payload) < 10 or payload[:4] != b"GIF8":
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return int(w), int(h)


# ---------------------------------------------------------------------------
# JPEG baseline codec (real huffman + DCT, pure Python + numpy)
# ---------------------------------------------------------------------------
#
# Decoder: baseline sequential DCT (SOF0) — canonical Huffman tables
# from DHT (works with any spec-valid tables, not just ours), DQT,
# arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0), DRI/RSTn restart
# handling, byte-unstuffing, matrix IDCT, YCbCr -> RGB.
# Encoder: spec-valid baseline writer used by the roundtrip tests and
# the synthetic corpus.  Its Huffman tables are GENERATED flat prefix
# codes (all DC symbols at one length, all AC symbols at another) —
# legal per the spec since the tables travel in DHT; this avoids
# hand-transcribing Annex K and keeps the encoder ~100 lines.  JPEG is
# lossy, so tests assert tolerance, not byte equality.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II basis: F = C @ B @ C.T, B = C.T @ F @ C
_DCT_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _huff_flat(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A legal canonical table with every symbol at the same code length
    (smallest L with 2^L > len(symbols), so the all-ones code stays
    reserved per the spec)."""
    L = 1
    while (1 << L) <= len(symbols):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, list(symbols)


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


def _canon_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by canonical assembly (spec C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, offset bits) per spec F.1.2.1 (EXTEND inverse)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def jpeg_encode(
    rgb: np.ndarray,
    quant: int = 2,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Real baseline JPEG writer: YCbCr, 8x8 DCT, uniform quantization
    (``quant``), generated-flat Huffman tables shipped in DHT."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("jpeg_encode expects (h, w, 3) uint8")
    if not 2 <= int(quant) <= 255:
        # quant 1 can produce 11-bit AC magnitudes, outside the AC
        # symbol alphabet (sizes 1-10); 2 already bounds them to 10 bits
        raise ValueError("quant must be in [2, 255]")
    h, w = rgb.shape[:2]
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0

    if subsample == "420":
        hs, vs = 2, 2
    elif subsample == "422":
        hs, vs = 2, 1
    elif subsample == "444":
        hs, vs = 1, 1
    else:
        raise ValueError(f"unsupported subsampling {subsample}")

    def pad_to(a: np.ndarray, mh: int, mw: int) -> np.ndarray:
        return np.pad(a, ((0, mh - a.shape[0]), (0, mw - a.shape[1])), mode="edge")

    mcu_h, mcu_w = 8 * vs, 8 * hs
    gh = (h + mcu_h - 1) // mcu_h * mcu_h
    gw = (w + mcu_w - 1) // mcu_w * mcu_w
    y = pad_to(y, gh, gw)
    cb = pad_to(cb, gh, gw)
    cr = pad_to(cr, gh, gw)
    if (hs, vs) != (1, 1):  # box-filter chroma downsample
        cb = cb.reshape(gh // vs, vs, gw // hs, hs).mean(axis=(1, 3))
        cr = cr.reshape(gh // vs, vs, gw // hs, hs).mean(axis=(1, 3))

    qtab = np.full(64, int(quant), dtype=np.int64)
    dc_bits, dc_vals = _huff_flat(_DC_SYMS)
    ac_bits, ac_vals = _huff_flat(_AC_SYMS)
    dc_codes = _canon_codes(dc_bits, dc_vals)
    ac_codes = _canon_codes(ac_bits, ac_vals)

    def block_coeffs(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
        b = plane[by : by + 8, bx : bx + 8] - 128.0
        fq = np.round((_DCT_C @ b @ _DCT_C.T).reshape(64)[_ZIGZAG] / qtab)
        return fq.astype(np.int64)

    wtr = _JBitWriter()
    pred = [0, 0, 0]

    def emit_block(zz: np.ndarray, ci: int) -> None:
        size, bits = _magnitude(int(zz[0]) - pred[ci])
        pred[ci] = int(zz[0])
        c, ln = dc_codes[size]
        wtr.put(c, ln)
        if size:
            wtr.put(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                wtr.put(c, ln)
                run -= 16
            size, bits = _magnitude(v)
            c, ln = ac_codes[(run << 4) | size]
            wtr.put(c, ln)
            wtr.put(bits, size)
            run = 0
        if run:
            c, ln = ac_codes[0x00]
            wtr.put(c, ln)

    n_mcux, n_mcuy = gw // mcu_w, gh // mcu_h
    mcu_i = 0
    rst = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred[:] = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    emit_block(
                        block_coeffs(y, my * mcu_h + by * 8, mx * mcu_w + bx * 8), 0
                    )
            emit_block(block_coeffs(cb, my * 8, mx * 8), 1)
            emit_block(block_coeffs(cr, my * 8, mx * 8), 2)
            mcu_i += 1
    wtr.align()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + qtab.astype(np.uint8).tobytes())  # table 0 (uniform: zigzag == natural order)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, (hs << 4) | vs, 0])
    sof += bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals))
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


class _JBitReader:
    """MSB-first reader over entropy data; unstuffs 0xFF00, stops at
    markers and reports RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: Optional[int] = None

    def _fill(self) -> bool:
        d = self.data
        while self.n < 25:
            if self.pos >= len(d):
                return self.n > 0
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt
                    return self.n > 0
                else:
                    self.marker = nxt
                    return self.n > 0
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        return True

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            if not self._fill() or self.n < k:
                if self.marker is not None:
                    # pad past the marker with 1s (spec-permitted fill)
                    self.acc = (self.acc << (k - self.n)) | ((1 << (k - self.n)) - 1)
                    self.n = k
                    break
                raise ValueError("truncated entropy data")
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker, resume."""
        self.acc = 0
        self.n = 0
        if self.marker is None:
            # seek forward to the marker
            d = self.data
            while self.pos + 1 < len(d):
                if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                    break
                self.pos += 1
        else:
            self.marker = None
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2


class _HuffTable:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.maxlen = max((i + 1 for i, b in enumerate(bits) if b), default=0)
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, rdr: _JBitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | rdr.bits(1)
            v = self.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real baseline JPEG decode (SOF0): any DHT tables, 8-bit DQT,
    4:4:4/4:2:2/4:2:0 sampling, DRI restarts.  Returns
    (width, height, (h, w, 3) uint8 RGB); grayscale is replicated."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan: list[dict] = []
    data_start = -1
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT unsupported (baseline is 8)")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1):
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
        elif marker == 0xC2:
            return jpeg_decode_progressive(payload)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append({"comp": comp, "dc": tt >> 4, "ac": tt & 0x0F})
            data_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if not comps or data_start < 0:
        raise ValueError("missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }
    rdr = _JBitReader(payload, data_start)
    pred = {c["id"]: 0 for c in comps}
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rdr.restart()
                for k in pred:
                    pred[k] = 0
            for s in scan:
                c = s["comp"]
                dct_t = huff[(0, s["dc"])]
                act = huff[(1, s["ac"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dct_t.decode(rdr)
                        diff = _extend(rdr.bits(size), size)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = act.decode(rdr)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rdr.bits(rs & 0x0F), rs & 0x0F)
                            k += 1
                        coeff = np.zeros(64, dtype=np.float64)
                        coeff[_ZIGZAG] = zz
                        block = _DCT_C.T @ (coeff.reshape(8, 8) * q) @ _DCT_C + 128.0
                        py0 = (my * c["v"] + by) * 8
                        px0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][py0 : py0 + 8, px0 : px0 + 8] = block
            mcu_i += 1

    return _planes_to_rgb(comps, planes, w, h, hmax, vmax)


def _planes_to_rgb(
    comps: list[dict],
    planes: dict[int, np.ndarray],
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, np.ndarray]:
    """Shared decode tail: upsample chroma, YCbCr -> RGB, crop to w x h
    (baseline and progressive paths produce identical plane grids)."""

    def upsample(c: dict) -> np.ndarray:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        return p[:h, :w]

    if len(comps) == 1:
        yv = np.clip(upsample(comps[0]), 0, 255).astype(np.uint8)
        return int(w), int(h), np.stack([yv, yv, yv], axis=2)
    yv = upsample(comps[0])
    cbv = upsample(comps[1]) - 128.0
    crv = upsample(comps[2]) - 128.0
    r = yv + 1.402 * crv
    g = yv - 0.344136 * cbv - 0.714136 * crv
    b = yv + 1.772 * cbv
    rgb = np.stack([r, g, b], axis=2)
    return int(w), int(h), np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- progressive JPEG (SOF2) -----------------------------------------------
#
# Real multi-scan decode per ITU-T T.81 Annex G: spectral selection +
# successive approximation, DC interleaved/non-interleaved scans, AC
# per-component scans with EOB runs, refinement correction bits, DRI
# restarts.  Coefficients accumulate across scans in per-component
# grids; one vectorized dequant+IDCT at EOI.  Closes the last disclosed
# media-decode degradation (r4 "What's missing" item 7): progressive
# payloads previously fell back to header dims in multimodal.decode_images.


def _jpeg_idct_grid(grid: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzag coefficient grid -> (nby*8, nbx*8) plane."""
    nby, nbx = grid.shape[:2]
    nat = np.zeros((nby * nbx, 64), dtype=np.float64)
    nat[:, _ZIGZAG] = grid.reshape(-1, 64)
    m = nat.reshape(-1, 8, 8) * q
    blocks = np.einsum("ij,njk,kl->nil", _DCT_C.T, m, _DCT_C) + 128.0
    return (
        blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    )


def _ac_refine_block(
    rdr: "_JBitReader",
    act: "_HuffTable",
    coef: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """One block of an AC refinement scan (Annex G.1.2.3 / the
    well-known decode_mcu_AC_refine structure).  ``coef`` is the 64-long
    zigzag view; returns the updated EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = act.decode(rdr)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("refinement scan magnitude must be 1")
                newval = p1 if rdr.bits(1) else -p1
            while k <= se:
                v = int(coef[k])
                if v != 0:
                    # correction bit for an already-nonzero coefficient
                    if rdr.bits(1) and (v & p1) == 0:
                        coef[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(coef[k])
            if v != 0:
                if rdr.bits(1) and (v & p1) == 0:
                    coef[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def jpeg_decode_progressive(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real progressive JPEG decode (SOF2): any scan script with
    spectral selection + successive approximation, DRI restarts,
    subsampled components.  Returns (width, height, (h, w, 3) RGB)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    coefs: dict[int, np.ndarray] = {}
    h = w = 0
    hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            # 0x00: a stuffed entropy byte left over after a scan whose
            # aligned tail ended in 0xFF — skip, it is not a marker
            pos += 2
            continue
        if marker == 0xD9:
            break
        if pos + 4 > n:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT unsupported (baseline is 8)")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = {
                c["id"]: np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )
                for c in comps
            }
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scomps.append({"comp": comp, "dc": tt >> 4, "ac": tt & 0x0F})
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if ss == 0 and se != 0:
                raise ValueError("progressive scan mixing DC and AC bands")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            if se > 63 or ss > 63:
                raise ValueError("bad spectral band")
            pos = _decode_progressive_scan(
                payload,
                pos + 2 + seglen,
                scomps,
                ss,
                se,
                ah,
                al,
                huff,
                coefs,
                w,
                h,
                hmax,
                vmax,
                mcux,
                mcuy,
                restart_interval,
            )
            continue
        pos += 2 + seglen
    if not comps or not coefs:
        raise ValueError("missing SOF/SOS")
    planes = {
        c["id"]: _jpeg_idct_grid(coefs[c["id"]], qt[c["tq"]]) for c in comps
    }
    return _planes_to_rgb(comps, planes, w, h, hmax, vmax)


def _decode_progressive_scan(
    payload: bytes,
    data_start: int,
    scomps: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff: dict[tuple[int, int], "_HuffTable"],
    coefs: dict[int, np.ndarray],
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    mcux: int,
    mcuy: int,
    restart_interval: int,
) -> int:
    """Decode one scan's entropy data into the coefficient grids;
    returns the payload position to resume marker parsing at."""
    rdr = _JBitReader(payload, data_start)
    pred = {s["comp"]["id"]: 0 for s in scomps}
    eobrun = 0
    unit_i = 0  # MCU index (interleaved) or block index (single comp)

    def maybe_restart() -> None:
        nonlocal eobrun
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            rdr.restart()
            for kk in pred:
                pred[kk] = 0
            eobrun = 0

    def dc_block(s: dict, coef: np.ndarray) -> None:
        c = s["comp"]
        if ah == 0:
            dct_t = huff[(0, s["dc"])]
            size = dct_t.decode(rdr)
            diff = _extend(rdr.bits(size), size)
            pred[c["id"]] += diff
            coef[0] = pred[c["id"]] << al
        elif rdr.bits(1):
            coef[0] = int(coef[0]) | (1 << al)

    if len(scomps) > 1:
        # interleaved (DC bands only — validated by the caller; an
        # ns == 1 scan is always non-interleaved per T.81 A.2)
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for s in scomps:
                    c = s["comp"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_block(
                                s,
                                coefs[c["id"]][my * c["v"] + by, mx * c["h"] + bx],
                            )
                unit_i += 1
    else:
        # non-interleaved: raster over the component's own block grid
        s = scomps[0]
        c = s["comp"]
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        act = huff.get((1, s["ac"])) if ss > 0 else None
        grid = coefs[c["id"]]
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                coef = grid[by, bx]
                if ss == 0:
                    dc_block(s, coef)
                elif ah == 0:
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = act.decode(rdr)
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += rdr.bits(r)
                                break
                            k += r
                            if k > se:
                                raise ValueError("AC band overflow")
                            coef[k] = _extend(rdr.bits(sz), sz) << al
                            k += 1
                else:
                    eobrun = _ac_refine_block(rdr, act, coef, ss, se, al, eobrun)
                unit_i += 1
    return max(rdr.pos, data_start)


def jpeg_encode_progressive(
    rgb: np.ndarray,
    quant: int = 2,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Real progressive JPEG writer (SOF2): the classic spectral-
    selection + successive-approximation scan script (DC first at Al=1
    then a refinement pass; luma AC split 1-5/6-63 at Al=2 refined in
    two passes; chroma AC at Al=1 refined once).  Encodes the SAME
    quantized coefficients as ``jpeg_encode`` — successive approximation
    is lossless across scans — so ``jpeg_decode`` of both byte streams
    yields bit-identical pixels (the roundtrip test's invariant)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("jpeg_encode_progressive expects (h, w, 3) uint8")
    if not 2 <= int(quant) <= 255:
        raise ValueError("quant must be in [2, 255]")
    h, w = rgb.shape[:2]
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0
    if subsample == "420":
        hs, vs = 2, 2
    elif subsample == "422":
        hs, vs = 2, 1
    elif subsample == "444":
        hs, vs = 1, 1
    else:
        raise ValueError(f"unsupported subsampling {subsample}")

    def pad_to(a: np.ndarray, mh: int, mw: int) -> np.ndarray:
        return np.pad(a, ((0, mh - a.shape[0]), (0, mw - a.shape[1])), mode="edge")

    mcu_h, mcu_w = 8 * vs, 8 * hs
    gh = (h + mcu_h - 1) // mcu_h * mcu_h
    gw = (w + mcu_w - 1) // mcu_w * mcu_w
    y = pad_to(y, gh, gw)
    cb = pad_to(cb, gh, gw)
    cr = pad_to(cr, gh, gw)
    if (hs, vs) != (1, 1):
        cb = cb.reshape(gh // vs, vs, gw // hs, hs).mean(axis=(1, 3))
        cr = cr.reshape(gh // vs, vs, gw // hs, hs).mean(axis=(1, 3))

    qtab = np.full(64, int(quant), dtype=np.int64)

    def coeff_grid(plane: np.ndarray) -> np.ndarray:
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        g = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                b = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                g[by, bx] = np.round(
                    (_DCT_C @ b @ _DCT_C.T).reshape(64)[_ZIGZAG] / qtab
                ).astype(np.int64)
        return g

    grids = [coeff_grid(y), coeff_grid(cb), coeff_grid(cr)]
    samps = [(hs, vs), (1, 1), (1, 1)]
    mcux, mcuy = gw // mcu_w, gh // mcu_h

    dc_bits, dc_vals = _huff_flat(_DC_SYMS)
    ac_bits, ac_vals = _huff_flat(_AC_SYMS)
    dc_codes = _canon_codes(dc_bits, dc_vals)
    ac_codes = _canon_codes(ac_bits, ac_vals)

    def scan_blocks(ci: int):
        """Non-interleaved block raster bounds for component ci."""
        chi, cvi = samps[ci]
        cw = -(-(w * chi) // hs)
        chh = -(-(h * cvi) // vs)
        return -(-chh // 8), -(-cw // 8)

    class _Restarter:
        """Per-scan restart state: byte-align and emit RSTn every
        ``restart_interval`` units (MCUs for DC scans, blocks for the
        non-interleaved AC scans), resetting the DC predictors —
        mirrors the baseline encoder's convention (T.81 B.2.1.2)."""

        def __init__(self, wtr: "_JBitWriter", pred: list[int]) -> None:
            self.wtr = wtr
            self.pred = pred
            self.unit = 0
            self.rst = 0

        def tick(self) -> None:
            if restart_interval and self.unit and self.unit % restart_interval == 0:
                self.wtr.align()
                self.wtr.out += bytes([0xFF, 0xD0 + self.rst])
                self.rst = (self.rst + 1) % 8
                self.pred[:] = [0] * len(self.pred)
            self.unit += 1

    def dc_scan(al: int, refine: bool) -> bytes:
        wtr = _JBitWriter()
        pred = [0, 0, 0]
        rster = _Restarter(wtr, pred)
        for my in range(mcuy):
            for mx in range(mcux):
                rster.tick()
                for ci in range(3):
                    chi, cvi = samps[ci]
                    for by in range(cvi):
                        for bx in range(chi):
                            dc = int(grids[ci][my * cvi + by, mx * chi + bx, 0])
                            if refine:
                                wtr.put((dc >> al) & 1, 1)
                            else:
                                v = dc >> al  # arithmetic shift per G.1.2.1
                                size, bits = _magnitude(v - pred[ci])
                                pred[ci] = v
                                c, ln = dc_codes[size]
                                wtr.put(c, ln)
                                if size:
                                    wtr.put(bits, size)
        wtr.align()
        return bytes(wtr.out)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _JBitWriter()
        nby, nbx = scan_blocks(ci)
        rster = _Restarter(wtr, [])
        for by in range(nby):
            for bx in range(nbx):
                rster.tick()
                zz = grids[ci][by, bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    m = abs(v) >> al  # toward-zero point transform (G.1.2.2)
                    if m == 0:
                        r += 1
                        continue
                    while r > 15:
                        c, ln = ac_codes[0xF0]
                        wtr.put(c, ln)
                        r -= 16
                    size, bits = _magnitude(m if v > 0 else -m)
                    c, ln = ac_codes[(r << 4) | size]
                    wtr.put(c, ln)
                    wtr.put(bits, size)
                    r = 0
                if r:
                    c, ln = ac_codes[0x00]  # per-block EOB (EOBRUN = 1)
                    wtr.put(c, ln)
        wtr.align()
        return bytes(wtr.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _JBitWriter()
        nby, nbx = scan_blocks(ci)
        rster = _Restarter(wtr, [])
        for by in range(nby):
            for bx in range(nbx):
                rster.tick()
                zz = grids[ci][by, bx]
                absv = [abs(int(zz[k])) >> al for k in range(64)]
                eob = ss - 1
                for k in range(ss, se + 1):
                    if absv[k]:
                        eob = k
                r = 0
                br: list[int] = []
                for k in range(ss, se + 1):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        c, ln = ac_codes[0xF0]
                        wtr.put(c, ln)
                        r -= 16
                        for b in br:
                            wtr.put(b, 1)
                        br = []
                    if t > 1:
                        # nonzero history: append a correction bit
                        br.append(t & 1)
                        continue
                    # newly nonzero at this approximation
                    c, ln = ac_codes[(r << 4) | 1]
                    wtr.put(c, ln)
                    wtr.put(1 if int(zz[k]) > 0 else 0, 1)
                    for b in br:
                        wtr.put(b, 1)
                    br = []
                    r = 0
                if r or br:
                    c, ln = ac_codes[0x00]  # EOB, then trailing corrections
                    wtr.put(c, ln)
                    for b in br:
                        wtr.put(b, 1)
        wtr.align()
        return bytes(wtr.out)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    def sos(scomps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(scomps)])
        for ci in scomps:
            body += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + qtab.astype(np.uint8).tobytes())
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, (hs << 4) | vs, 0])
    sof += bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals))
    # the classic libjpeg-style script: coarse DC, luma band split,
    # chroma, then refinement passes down to full precision
    out += sos([0, 1, 2], 0, 0, 0, 1) + dc_scan(1, refine=False)
    out += sos([0], 1, 5, 0, 2) + ac_first_scan(0, 1, 5, 2)
    out += sos([1], 1, 63, 0, 1) + ac_first_scan(1, 1, 63, 1)
    out += sos([2], 1, 63, 0, 1) + ac_first_scan(2, 1, 63, 1)
    out += sos([0], 6, 63, 0, 2) + ac_first_scan(0, 6, 63, 2)
    out += sos([0], 1, 63, 2, 1) + ac_refine_scan(0, 1, 63, 1)
    out += sos([0, 1, 2], 0, 0, 1, 0) + dc_scan(0, refine=True)
    out += sos([0], 1, 63, 1, 0) + ac_refine_scan(0, 1, 63, 0)
    out += sos([1], 1, 63, 1, 0) + ac_refine_scan(1, 1, 63, 0)
    out += sos([2], 1, 63, 1, 0) + ac_refine_scan(2, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)
#
# Encoder: palette-based GIF87a writer for images with <= 256 distinct
# colors (variable-width LZW, deferred width growth per the GIF spec).
# Decoder: first image block -> (h, w, 3) RGB via the global/local color
# table; handles interlace and mid-stream CLEAR codes.  Together they
# close the `_FAKE_DECODE` seam for GIF in multimodal.decode_images.


class _BitWriter:
    """LSB-first bit packer feeding GIF's <=255-byte sub-block framing."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.bytes = bytearray()

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        out = bytearray()
        for i in range(0, len(self.bytes), 255):
            chunk = self.bytes[i : i + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)  # block terminator
        return bytes(out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {}
    next_code = eoi + 1
    w.put(clear, width)
    prefix = b""
    for k in indices.tobytes():
        cand = prefix + bytes([k])
        if len(cand) > 1 and cand in table:
            prefix = cand
            continue
        if len(cand) == 1:
            prefix = cand
            continue
        w.put(table[prefix] if len(prefix) > 1 else prefix[0], width)
        table[cand] = next_code
        next_code += 1
        # encoder runs one entry AHEAD of the decoder: bump width when
        # next_code == (1 << width) + 1 so emitted codes match the
        # decoder's deferred width growth (GIF spec, not TIFF early-change)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        prefix = bytes([k])
        if next_code == 4096:
            w.put(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
    if prefix:
        w.put(table[prefix] if len(prefix) > 1 else prefix[0], width)
    w.put(eoi, width)
    return w.finish()


def gif_encode(rgb: np.ndarray) -> bytes:
    """Minimal real GIF87a: one frame, global color table built from the
    image's distinct colors (<= 256 required), real variable-width LZW."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("gif_encode expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("gif_encode supports <= 256 distinct colors")
    # color table size is a power of two >= 2 entries
    ct_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    min_code_size = max(2, ct_bits)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (ct_bits - 1))  # GCT present, 2^ct_bits entries
    out += b"\x00\x00"  # bg color, aspect
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # no LCT
    out.append(min_code_size)
    out += _lzw_encode(indices.astype(np.uint8), min_code_size)
    out.append(0x3B)
    return bytes(out)


class _BitReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def get(self, width: int) -> Optional[int]:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: Optional[bytes] = None
    while len(out) < n_pixels:
        code = r.get(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def gif_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real GIF pixel decode: first image block, global or local color
    table, interlace supported.  Returns (width, height, (h, w, 3) uint8)."""
    if len(payload) < 13 or payload[:4] != b"GIF8":
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _, _, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        ipacked = payload[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(data), min_code_size, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            de = np.zeros_like(idx)
            de[np.asarray(order)] = idx
            idx = de
        rgb = ct[np.clip(idx, 0, len(ct) - 1)]
        return int(iw), int(ih), rgb.astype(np.uint8)
    raise ValueError("no image block")


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Real PCM16 mono WAV from an int16 sample array."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode expects int16 samples")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def wav_decode(payload: bytes) -> dict:
    """Real WAV decode: walks RIFF chunks, returns rate/channels/width,
    the PCM16 sample array, and duration_ms."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = channels = width_bits = None
    data = b""
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
        if cid == b"fmt " and len(body) >= 16:
            _, channels, rate, _, _, width_bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if rate is None:
        raise ValueError("missing fmt chunk")
    if width_bits == 16:
        samples = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    elif width_bits == 8:
        # 8-bit PCM is unsigned with a 128 bias per the WAV spec; scale
        # to int16 range so silence is 0 and features are comparable
        samples = (
            (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
        )
    elif width_bits == 24:
        usable = data[: len(data) - (len(data) % 3)]
        b = np.frombuffer(usable, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        raw24 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        raw24 = np.where(raw24 >= 1 << 23, raw24 - (1 << 24), raw24)
        samples = (raw24 >> 8).astype(np.int16)  # keep the top 16 bits
    elif width_bits == 32:
        raw32 = np.frombuffer(data[: len(data) - (len(data) % 4)], dtype="<i4")
        samples = (raw32 >> 16).astype(np.int16)
    else:
        raise ValueError(f"unsupported PCM width {width_bits}")
    n_frames = len(samples) // max(channels, 1)
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(width_bits),
        "samples": samples,
        "n_frames": int(n_frames),
        "duration_ms": int(n_frames * 1000 / rate) if rate else 0,
    }


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF)
# ---------------------------------------------------------------------------

def mp4_box(mvhd_timescale: int, mvhd_duration: int) -> bytes:
    """A minimal real ftyp+moov/mvhd prefix carrying a duration."""
    ftyp = struct.pack(">I", 16) + b"ftypmp42" + b"mp42"
    mvhd_body = (
        b"\x00\x00\x00\x00"  # version/flags
        + struct.pack(">II", 0, 0)  # ctime/mtime
        + struct.pack(">II", mvhd_timescale, mvhd_duration)
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def mp4_duration_ms(payload: bytes) -> Optional[int]:
    """Walk top-level boxes to moov/mvhd; duration * 1000 / timescale."""
    pos = 0
    n = len(payload)
    while pos + 8 <= n:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        if size < 8:
            return None
        if typ == b"moov":
            inner, end = pos + 8, min(pos + size, n)
            while inner + 8 <= end:
                (isz,) = struct.unpack(">I", payload[inner : inner + 4])
                ityp = payload[inner + 4 : inner + 8]
                if ityp == b"mvhd" and inner + 8 + 20 <= end:
                    version = payload[inner + 8]
                    if version == 1:
                        ts, dur = struct.unpack(
                            ">IQ", payload[inner + 28 : inner + 40]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", payload[inner + 20 : inner + 28]
                        )
                    return int(dur * 1000 / ts) if ts else None
                if isz < 8:
                    return None
                inner += isz
        pos += size
    return None


# ---------------------------------------------------------------------------
# AVI (RIFF) MJPEG — the 'movi' LIST is concatenated '00dc' chunks, each a
# complete baseline JPEG, so jpeg_decode() gives REAL video frame pixels
# without ffmpeg.  (Reference scope: fastfeedparser has no media decode at
# all — this backs the training-data-pipeline multimodal tier.)
# ---------------------------------------------------------------------------

def avi_encode_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quant: int = 4,
    subsample: str = "444",
) -> bytes:
    """Minimal spec-valid AVI wrapping each HxWx3 uint8 frame as a
    baseline JPEG '00dc' chunk: RIFF('AVI ') / LIST hdrl (avih + LIST
    strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) / LIST movi /
    idx1.  Deterministic byte-for-byte given the same inputs."""
    if not frames:
        raise ValueError("avi_encode_mjpeg needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    h, w = frames[0].shape[:2]
    jpgs = [jpeg_encode(f, quant=quant, subsample=subsample) for f in frames]
    usec = 1_000_000 // fps

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_jpg = max(len(j) for j in jpgs)
    avih = struct.pack(
        "<14I", usec, max_jpg * fps, 0, 0x10, len(jpgs), 0, 1, max_jpg,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpgs), max_jpg, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx_entries = []
    for j in jpgs:
        # idx1 offsets follow the mainstream convention: measured from
        # the 'movi' FOURCC, so the first chunk header sits at offset 4
        # (ADVICE r4 — external players seek via idx1; the in-repo
        # decoder walks the movi LIST directly and is unaffected)
        idx_entries.append(struct.pack("<4sII", b"00dc", 0x10, len(movi_body)))
        idx_entries.append(struct.pack("<I", len(j)))
        movi_body += chunk(b"00dc", j)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", b"".join(
        idx_entries[i] + idx_entries[i + 1] for i in range(0, len(idx_entries), 2)
    ))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_info(payload: bytes) -> Optional[dict]:
    """Header probe: width/height/n_frames/usec-per-frame/duration_ms
    from the avih chunk.  None when not an AVI; malformed headers raise
    (callers contain)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"LIST" and body[:4] == b"hdrl":
            inner, end = pos + 12, pos + 8 + clen
            while inner + 8 <= end:
                icid = payload[inner : inner + 4]
                (ilen,) = struct.unpack("<I", payload[inner + 4 : inner + 8])
                if icid == b"avih" and ilen >= 40:
                    vals = struct.unpack("<10I", payload[inner + 8 : inner + 48])
                    usec, total, width, height = vals[0], vals[4], vals[8], vals[9]
                    return {
                        "usec_per_frame": int(usec),
                        "n_frames": int(total),
                        "width": int(width),
                        "height": int(height),
                        "duration_ms": int(total * usec // 1000),
                    }
                inner += 8 + ilen + (ilen & 1)
        pos += 8 + clen + (clen & 1)
    return None


def avi_mjpeg_frames(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Split the 'movi' LIST into (frame_idx, ts_ms, jpeg_bytes) rows.
    Walks RIFF chunks only — each returned payload is a complete JPEG
    for jpeg_decode().  Raises on non-AVI input (callers contain)."""
    info = avi_info(payload)
    if info is None:
        raise ValueError("not an AVI")
    usec = info["usec_per_frame"] or 100_000
    out: list[tuple[int, int, bytes]] = []
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            inner, end = pos + 12, min(pos + 8 + clen, n)
            while inner + 8 <= end:
                fcid = payload[inner : inner + 4]
                (flen,) = struct.unpack("<I", payload[inner + 4 : inner + 8])
                if fcid[2:4] in (b"dc", b"db"):
                    idx = len(out)
                    out.append(
                        (idx, idx * usec // 1000, payload[inner + 8 : inner + 8 + flen])
                    )
                inner += 8 + flen + (flen & 1)
        pos += 8 + clen + (clen & 1)
    return out
