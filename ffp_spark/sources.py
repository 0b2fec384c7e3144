"""WARC source connector (S8): read web-archive files distributed.

CommonCrawl-style ingestion: a crawl ships as thousands of ~1 GB
.warc(.gz) files, and the scale unit is the FILE — Spark parallelizes
across files (binaryFile source), each task splits its file into
records locally, and only the projected record fields leave the task.
That is exactly how production WARC pipelines shard 100 TB crawls; no
record-level split index is needed because file count >> executor
count at any realistic crawl size.

Format essentials implemented here (public WARC/1.1 spec, ISO 28500):
records are "WARC/1.0\\r\\n" + header lines + CRLF CRLF + exactly
Content-Length payload bytes + CRLF CRLF.  The .gz variant
concatenates one gzip member per record (Python's gzip handles
multi-member streams transparently, so whole-file decompress is
correct).  The encoder exists so tests and queries can synthesize
deterministic archives — byte-for-byte reproducible, no wall clock.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("rec_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("content_length", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def warc_record(rec_type: str, target_uri: str | None, payload: bytes) -> bytes:
    """One WARC record, spec-shaped (header block + CRLFCRLF + payload
    + CRLFCRLF).  WARC-Record-ID is derived from the target URI — the
    encoder is a pure function of its arguments."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + rec_type.encode(),
        b"WARC-Record-ID: <urn:ffp:" + (target_uri or "none").encode() + b">",
    ]
    if target_uri is not None:
        headers.append(b"WARC-Target-URI: " + target_uri.encode())
    headers.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def warc_file_bytes(
    records: Iterable[tuple[str, str | None, bytes]], gz: bool = False
) -> bytes:
    """Concatenated records; with ``gz`` one gzip member per record
    (mtime pinned to 0 — byte-deterministic)."""
    out = io.BytesIO()
    for rec_type, uri, payload in records:
        raw = warc_record(rec_type, uri, payload)
        if gz:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(raw)
            out.write(buf.getvalue())
        else:
            out.write(raw)
    return out.getvalue()


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Split one (decompressed) WARC stream into records.  Uses the
    Content-Length header to jump payloads — never scans payload bytes
    for record markers (payloads may contain 'WARC/1.0').  Malformed
    trailing garbage yields a final record with rec_type='error'
    rather than an exception (error-row discipline, pipeline-wide)."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            out.append(
                {"rec_type": "error", "target_uri": None,
                 "content_length": n - pos, "payload": data[pos:]}
            )
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            out.append(
                {"rec_type": "error", "target_uri": None,
                 "content_length": n - pos, "payload": data[pos:]}
            )
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        clen = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        payload = data[body_start:body_start + clen]
        out.append(
            {
                "rec_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen + 4  # skip payload + CRLF CRLF
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: binaryFile source (one task per file —
    the crawl's natural parallelism unit) + mapInArrow record split.
    Gzip is detected per file by magic bytes; multi-member streams
    (record-per-member, the CommonCrawl layout) decompress in one
    pass.  Returns WARC_SCHEMA rows."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    files = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("file"), "content"
    )

    def split(batches):
        out_schema = to_arrow_schema(WARC_SCHEMA)
        for batch in batches:
            rows = []
            for path_, content in zip(
                batch.column("file").to_pylist(),
                batch.column("content").to_pylist(),
            ):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                for rec in parse_warc_bytes(data):
                    rec = dict(rec)
                    rec["file"] = path_.rsplit("/", 1)[-1]
                    rows.append(rec)
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return files.mapInArrow(split, schema=WARC_SCHEMA)
