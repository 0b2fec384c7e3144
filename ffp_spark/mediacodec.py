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


# --- GIF pixel codec (real LZW, pure Python + numpy) -----------------------
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
