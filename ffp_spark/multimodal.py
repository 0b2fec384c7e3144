"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode libraries (PIL/ffmpeg/librosa) are not available in this
container, so the *decode kernels* are deterministic stubs behind
clearly-marked seams (`_FAKE_DECODE`), while everything Spark-side is
real and tested: binary columns, magic-byte sniffing, typed metadata
structs, Arrow batch shapes, mapInPandas signatures, frame-sampling row
expansion, and embedding columns that feed the ANN operators.

At 100 TB the pattern is: keep payloads as parquet binary, sniff/route
JVM-side where possible, decode in Arrow-batched Python with bounded
batch bytes (spark.sql.execution.arrow.maxRecordsPerBatch), and emit
fixed-width features immediately so the heavy bytes never shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Set True in this sandbox: decode produces deterministic fakes instead of
# raising NotImplementedError.  Flip to False where real codecs exist.
_FAKE_DECODE = True

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


def decode_images(df: DataFrame) -> DataFrame:
    """Binary image column -> (width, height, RGB bytes).

    STUB KERNEL: real decode requires PIL/libjpeg (absent here); the fake
    derives deterministic dimensions and pixel bytes from the id so the
    batch shapes, schema, and downstream resize/feature ops are testable.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if not _FAKE_DECODE:
                    raise NotImplementedError("image decode requires PIL/libjpeg")
                d = int.from_bytes(hashlib.sha256(str(r.media_id).encode()).digest()[:4], "big")
                w, h = 16 + d % 48, 16 + (d >> 8) % 48
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "pixels": _fake_pixels(str(r.media_id), w, h),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema=DECODED_IMAGE_SCHEMA)


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

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                src = np.frombuffer(bytes(r.pixels), dtype=np.uint8)
                src = src[: int(r.width) * int(r.height) * 3].reshape(
                    int(r.height), int(r.width), 3
                )
                ys = (np.arange(out_h) * r.height // out_h).astype(int)
                xs = (np.arange(out_w) * r.width // out_w).astype(int)
                out = src[ys][:, xs]
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": out_w,
                        "height": out_h,
                        "pixels": out.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(run, schema=schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> frame rows (row expansion inside mapInPandas; the frame
    decode itself is the stub kernel)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                dur = int(r.duration_ms or 0)
                for idx, ts in enumerate(range(0, dur, every_ms)):
                    if not _FAKE_DECODE:
                        raise NotImplementedError("frame decode requires ffmpeg")
                    fake = hashlib.sha256(f"{r.media_id}:{idx}".encode()).digest()
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": idx,
                            "ts_ms": ts,
                            "frame": fake,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms"
    ).mapInPandas(run, schema=FRAME_SCHEMA)


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
    rows = []
    for i in range(n):
        d = hashlib.md5(f"{seed}:{i}".encode()).digest()
        pick = d[0] % 4
        body = (d * 64)[:512]
        if pick == 0:
            payload = b"\x89PNG\r\n\x1a\n" + body
            kind, dur = "image", None
        elif pick == 1:
            payload = b"\xff\xd8\xff\xe0" + body
            kind, dur = "image", None
        elif pick == 2:
            payload = b"RIFF" + body[:4] + b"WAVE" + body
            kind, dur = "audio", 1000 + (d[1] % 10) * 500
        else:
            payload = b"\x00\x00\x00\x18ftypmp42" + body
            kind, dur = "video", 2000 + (d[1] % 8) * 1000
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
