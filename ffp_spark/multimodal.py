"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode support in this environment (no PIL/ffmpeg, but struct/zlib are
stdlib — see mediacodec.py):

* REAL: PNG pixel decode (8-bit RGB/RGBA, filters 0-4), PNG encode,
  GIF pixel decode (variable-width LZW, interlace) + palette GIF
  encode, BASELINE JPEG decode (canonical Huffman from DHT, matrix
  IDCT, 4:4:4/4:2:2/4:2:0, DRI restarts) + a spec-valid JPEG encoder,
  JPEG/GIF header dimensions, WAV PCM sample decode + audio features,
  MP4 mvhd duration, AVI/MJPEG video FRAME decode (RIFF 'movi'
  chunks are complete baseline JPEGs) — all pure-Python byte parsing.
* DEGRADED (deterministic fake pixels, real row shape): non-MJPEG
  video frames (raw H.264/VP9 needs ffmpeg, absent here), progressive
  JPEG (header dims real) and entropy-corrupt images.  Degradation is
  a row-level property — no code path raises for an unsupported
  payload (the fuzz suite enforces exception tightness).

At 100 TB the pattern is: keep payloads as parquet binary, sniff/route
JVM-side where possible, decode in Arrow-batched Python with bounded
batch bytes (spark.sql.execution.arrow.maxRecordsPerBatch), and emit
fixed-width features immediately so the heavy bytes never shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import mediacodec as mc

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("pixels", BinaryType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("frame", BinaryType(), True),
    ]
)

_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),  # refined below: RIFF....WAVE
    (b"ID3", "audio/mpeg"),
)


def sniff_mime(payload: bytes | None) -> str | None:
    if not payload:
        return None
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            if mime == "audio/wav" and payload[8:12] != b"WAVE":
                if payload[8:12] == b"AVI ":
                    return "video/x-msvideo"
                continue
            return mime
    if len(payload) > 11 and payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def attach_mime(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte sniffing as an Arrow-batched pandas UDF over the binary
    prefix only (substring pushes the byte slice JVM-side first)."""

    @F.pandas_udf(StringType())
    def _sniff(prefix: pd.Series) -> pd.Series:
        return prefix.map(lambda b: sniff_mime(bytes(b) if b is not None else None))

    return df.withColumn(
        "mime", _sniff(F.expr(f"substring({payload_col}, 1, 16)"))
    )


def _fake_pixels(media_id: str, w: int, h: int) -> bytes:
    seed = hashlib.sha256(media_id.encode()).digest()
    reps = (w * h * 3) // len(seed) + 1
    return (seed * reps)[: w * h * 3]


def _arrow(schema):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _decode_image_row(media_id: str, payload: bytes) -> dict:
    """Per-row decode with total exception containment: malformed media
    must degrade (header dims or fake), never fail the task."""
    w = h = None
    pixels = None
    if payload.startswith(b"\x89PNG"):
        try:
            w, h, arr = mc.png_decode(payload)
            if arr.shape[2] == 4:
                arr = arr[:, :, :3]
            elif arr.shape[2] == 1:
                arr = np.repeat(arr, 3, axis=2)
            elif arr.shape[2] == 2:  # gray+alpha
                arr = np.repeat(arr[:, :, :1], 3, axis=2)
            pixels = arr.tobytes()
        except Exception:  # zlib.error / struct.error / ValueError alike
            w = h = pixels = None
    elif payload.startswith(b"GIF8"):
        try:
            w, h, arr = mc.gif_decode(payload)  # real LZW pixel decode
            pixels = arr.tobytes()
        except Exception:  # corrupt LZW/color table degrades below
            w = h = pixels = None
    elif payload.startswith(b"\xff\xd8"):
        try:
            w, h, arr = mc.jpeg_decode(payload)  # real baseline decode
            pixels = arr.tobytes()
        except Exception:  # progressive/corrupt entropy data degrades
            w = h = pixels = None
    if pixels is None:
        try:
            dims = mc.jpeg_dims(payload) or mc.gif_dims(payload)
        except Exception:
            dims = None
        if dims:
            w, h = dims
        if w is None:
            d = int.from_bytes(hashlib.sha256(str(media_id).encode()).digest()[:4], "big")
            w, h = 16 + d % 48, 16 + (d >> 8) % 48
        # real dims, degraded pixel bytes (non-baseline/corrupt entropy)
        pixels = _fake_pixels(str(media_id), w, h)
    return {"media_id": media_id, "width": w, "height": h, "pixels": pixels}


def decode_images(df: DataFrame) -> DataFrame:
    """Binary image column -> (width, height, RGB bytes).

    PNG, GIF and baseline JPEG payloads decode FOR REAL
    (mediacodec.png_decode: zlib inflate + per-row unfilter;
    gif_decode: variable-width LZW + color table, interlace-aware;
    jpeg_decode: canonical Huffman + matrix IDCT, subsampling and
    restart markers).  Progressive JPEG falls back to real header
    dimensions with fake pixel bytes (the `_FAKE_DECODE` seam);
    unknown/corrupt payloads degrade to fake dims+pixels, never a task
    failure.  mapInArrow: binary through pandas object arrays is the
    measured 15x cliff.
    """

    def run(batches):
        import pyarrow as pa

        out_schema = _arrow(DECODED_IMAGE_SCHEMA)
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = [
                _decode_image_row(i, bytes(p) if p is not None else b"")
                for i, p in zip(ids, payloads)
            ]
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return df.select("media_id", "payload").mapInArrow(run, schema=DECODED_IMAGE_SCHEMA)


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def _probe_row(media_id: str, payload: bytes) -> dict:
    rec = {
        "media_id": media_id,
        "mime": sniff_mime(payload),
        "width": None,
        "height": None,
        "duration_ms": None,
        "sample_rate": None,
        "channels": None,
    }
    try:
        dims = mc.png_dims(payload) or mc.jpeg_dims(payload) or mc.gif_dims(payload)
        if dims:
            rec["width"], rec["height"] = dims
        if rec["mime"] == "audio/wav":
            info = mc.wav_decode(payload)
            rec["duration_ms"] = info["duration_ms"]
            rec["sample_rate"] = info["sample_rate"]
            rec["channels"] = info["channels"]
        elif rec["mime"] == "video/mp4":
            rec["duration_ms"] = mc.mp4_duration_ms(payload)
        elif rec["mime"] == "video/x-msvideo":
            info = mc.avi_info(payload)
            if info:
                rec["width"] = info["width"]
                rec["height"] = info["height"]
                rec["duration_ms"] = info["duration_ms"]
    except Exception:  # truncated/corrupt headers probe to NULLs
        pass
    return rec


def probe_media(df: DataFrame) -> DataFrame:
    """ffprobe-style REAL header probe, pure Python: mime + dimensions
    (PNG/JPEG/GIF), duration (WAV data length, MP4 mvhd), audio rate/
    channels.  mapInArrow-batched; corrupt headers yield NULL fields,
    never task failures."""

    def run(batches):
        import pyarrow as pa

        out_schema = _arrow(PROBE_SCHEMA)
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = [
                _probe_row(i, bytes(p) if p is not None else b"")
                for i, p in zip(ids, payloads)
            ]
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return df.select("media_id", "payload").mapInArrow(run, schema=PROBE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", IntegerType(), True),
    ]
)


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL WAV decode to features: PCM samples via struct (16/8/24/32
    bit), then RMS and peak computed in numpy — the heavy bytes die
    inside the UDF and only fixed-width features come out (the
    100 TB-safe shape).  Corrupt payloads yield NULL features."""

    def run(batches):
        import pyarrow as pa

        out_schema = _arrow(AUDIO_FEATURES_SCHEMA)
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = []
            for media_id, p in zip(ids, payloads):
                payload = bytes(p) if p is not None else b""
                rec = {
                    "media_id": media_id,
                    "sample_rate": None,
                    "channels": None,
                    "n_frames": None,
                    "duration_ms": None,
                    "rms": None,
                    "peak": None,
                }
                try:
                    info = mc.wav_decode(payload)
                    s = info["samples"].astype(np.float64)
                    rec.update(
                        sample_rate=info["sample_rate"],
                        channels=info["channels"],
                        n_frames=info["n_frames"],
                        duration_ms=info["duration_ms"],
                        rms=float(np.sqrt(np.mean(s * s))) if len(s) else 0.0,
                        peak=int(np.max(np.abs(info["samples"]))) if len(s) else 0,
                    )
                except Exception:
                    pass
                rows.append(rec)
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return df.select("media_id", "payload").mapInArrow(run, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize. STUB KERNEL: numpy-only stand-in with the
    real signature (batch in, fixed-size RGB out)."""

    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("pixels", BinaryType(), True),
        ]
    )

    def run(batches):
        import pyarrow as pa

        out_schema = _arrow(schema)
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            widths = batch.column("width").to_pylist()
            heights = batch.column("height").to_pylist()
            pixels = batch.column("pixels").to_pylist()
            rows = []
            for media_id, w, h, px in zip(ids, widths, heights, pixels):
                # corrupt-media containment: a crafted PNG can declare
                # zero/negative dims (empty pixels) — degrade to a NULL
                # pixel row instead of failing the task on the numpy
                # fancy-index.
                w = int(w) if w is not None else 0
                h = int(h) if h is not None else 0
                src = np.frombuffer(bytes(px) if px is not None else b"", dtype=np.uint8)
                if w <= 0 or h <= 0 or len(src) < w * h * 3:
                    rows.append(
                        {
                            "media_id": media_id,
                            "width": out_w,
                            "height": out_h,
                            "pixels": None,
                        }
                    )
                    continue
                src = src[: w * h * 3].reshape(h, w, 3)
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                out = src[ys][:, xs]
                rows.append(
                    {
                        "media_id": media_id,
                        "width": out_w,
                        "height": out_h,
                        "pixels": out.tobytes(),
                    }
                )
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return decoded.select("media_id", "width", "height", "pixels").mapInArrow(
        run, schema=schema
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> one frame row per `every_ms` tick (row expansion inside
    mapInArrow).

    AVI/MJPEG payloads decode FOR REAL: the RIFF 'movi' chunks are
    complete baseline JPEGs (mediacodec.avi_mjpeg_frames), each sampled
    tick takes the frame at-or-before it, and that JPEG runs through
    jpeg_decode -> raw RGB bytes with real width/height.  Each source
    frame decodes at most once per video even when ticks repeat it.
    Non-MJPEG video (raw H.264/VP9 needs ffmpeg, absent in this
    environment) degrades to deterministic fake bytes with NULL dims —
    a row-level property, never a task failure."""

    def run(batches):
        import pyarrow as pa

        out_schema = _arrow(FRAME_SCHEMA)
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            durs = batch.column("duration_ms").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = []
            for media_id, dur, p in zip(ids, durs, payloads):
                payload = bytes(p) if p is not None else b""
                src = None  # [(ts_ms, jpeg_bytes)] for MJPEG
                try:
                    info = mc.avi_info(payload)
                    if info:
                        src = mc.avi_mjpeg_frames(payload)
                        if dur is None:
                            dur = info["duration_ms"]
                except Exception:  # malformed RIFF degrades below
                    src = None
                decoded: dict[int, tuple] = {}  # src idx -> (w, h, bytes)
                for idx, ts in enumerate(range(0, int(dur or 0), every_ms)):
                    w = h = None
                    frame = None
                    if src:
                        # frame at-or-before the tick
                        j = max(
                            (k for k, (_, fts, _) in enumerate(src) if fts <= ts),
                            default=0,
                        )
                        if j not in decoded:
                            try:
                                fw, fh, arr = mc.jpeg_decode(src[j][2])
                                decoded[j] = (fw, fh, arr.tobytes())
                            except Exception:  # corrupt frame chunk
                                decoded[j] = (None, None, None)
                        w, h, frame = decoded[j]
                    if frame is None:
                        frame = hashlib.sha256(f"{media_id}:{idx}".encode()).digest()
                        w = h = None
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "ts_ms": ts,
                            "width": w,
                            "height": h,
                            "frame": frame,
                        }
                    )
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms", "payload"
    ).mapInArrow(run, schema=FRAME_SCHEMA)


def embed_media(df: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic feature embedding from payload bytes (fake model;
    real plumbing): array<float> column consumable by the ANN operators."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            if b is None:
                out.append(None)
                continue
            seed = hashlib.sha256(bytes(b)).digest()
            rng = np.random.RandomState(int.from_bytes(seed[:4], "big"))
            v = rng.randn(dim).astype(np.float32)
            v /= np.linalg.norm(v) or 1.0
            out.append(v)
        return pd.Series(out)

    return df.withColumn("embedding", _embed(F.col("payload")))


# ---------------------------------------------------------------------------
# deterministic synthetic media corpus (tests/bench)
# ---------------------------------------------------------------------------

def synth_media_rows(n: int, seed: int = 42) -> list[dict]:
    """Deterministic corpus of REAL payloads: decodable PNGs and
    baseline JPEGs, PCM16 WAVs, MP4 ftyp+mvhd boxes (header-only
    video), and fully decodable MJPEG AVIs."""
    rows = []
    for i in range(n):
        d = hashlib.md5(f"{seed}:{i}".encode()).digest()
        pick = d[0] % 4
        if pick == 0:
            w, h = 8 + d[1] % 24, 8 + d[2] % 24
            rng = np.random.RandomState(int.from_bytes(d[4:8], "big"))
            payload = mc.png_encode(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
            kind, dur = "image", None
        elif pick == 1:
            # REAL baseline JPEG (decodable), same dims formula the
            # probe oracle expects; smooth gradient keeps encode cheap
            w, h = 32 + d[1] % 64, 32 + d[2] % 64
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * (1 + d[3] % 3)) % 256,
                    (yy * (1 + d[4] % 3)) % 256,
                    ((xx + yy) * (1 + d[5] % 2)) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            payload = mc.jpeg_encode(img, quant=4, subsample="420")
            kind, dur = "image", None
        elif pick == 2:
            rate = 8000
            dur = 1000 + (d[1] % 10) * 500
            t = np.arange(rate * dur // 1000)
            tone = (
                np.sin(2 * np.pi * (200 + d[2]) * t / rate) * (1000 + d[3] * 8)
            ).astype(np.int16)
            payload = mc.wav_encode(tone, sample_rate=rate)
            kind = "audio"
        elif d[2] % 2 == 0:
            dur = 2000 + (d[1] % 8) * 1000
            payload = mc.mp4_box(mvhd_timescale=1000, mvhd_duration=dur)
            kind = "video"
        else:
            # REAL MJPEG AVI: every frame decodes to actual pixels
            fps = 2 + d[3] % 3
            n_frames = 2 + d[1] % 6
            w, h = 16 + d[4] % 16, 16 + d[5] % 16
            frames = [
                np.full((h, w, 3), (d[6] + 31 * k) % 256, dtype=np.uint8)
                for k in range(n_frames)
            ]
            payload = mc.avi_encode_mjpeg(frames, fps=fps)
            dur = n_frames * (1_000_000 // fps) // 1000
            kind = "video"
        rows.append(
            {
                "media_id": f"m{i:06d}",
                "kind": kind,
                "payload": payload,
                "mime": None,
                "duration_ms": dur,
            }
        )
    return rows


def ahash64_halves(gray) -> tuple[int, int]:
    """Perceptual average-hash of a grayscale image whose sides are
    multiples of 8 (K81): block-average down to 8x8 (integral floor
    division), threshold each block against the floor-mean of the 64
    block values, bit index = by*8 + bx.  Returned as (hi, lo) 32-bit
    halves — bit 63 of a single BIGINT cannot round-trip through
    engines that reject 1<<63 (DuckDB), and the Hamming arithmetic
    downstream works on the halves unchanged.

    All-integer: bit-identical wherever the pixel bytes are.
    """
    import numpy as np

    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    if h % 8 or w % 8:
        raise ValueError("ahash64_halves needs sides divisible by 8")
    bh, bw = h // 8, w // 8
    blocks = g.reshape(8, bh, 8, bw).sum(axis=(1, 3)) // (bh * bw)
    mean = int(blocks.sum()) // 64
    bits = (blocks >= mean).astype(np.int64).ravel()  # index = by*8 + bx
    lo = int(sum(int(b) << i for i, b in enumerate(bits[:32])))
    hi = int(sum(int(b) << i for i, b in enumerate(bits[32:])))
    return hi, lo
