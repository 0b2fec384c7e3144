"""WARC source connector (ffp_spark.sources, S8)."""

from __future__ import annotations

from pathlib import Path

from ffp_spark.sources import (
    parse_warc_bytes,
    read_warc,
    warc_file_bytes,
    warc_record,
)


def test_roundtrip_plain_and_gz():
    recs = [
        ("response", "https://a.example/", b"hello world"),
        ("request", "https://a.example/", b""),
        ("metadata", None, b"\x00\x01\x02binary ok"),
    ]
    for gz in (False, True):
        data = warc_file_bytes(recs, gz=gz)
        if gz:
            import gzip

            data = gzip.decompress(data)
        got = parse_warc_bytes(data)
        assert [(r["rec_type"], r["target_uri"], r["payload"]) for r in got] == [
            ("response", "https://a.example/", b"hello world"),
            ("request", "https://a.example/", b""),
            ("metadata", None, b"\x00\x01\x02binary ok"),
        ]
        assert all(r["content_length"] == len(r["payload"]) for r in got)


def test_payload_containing_record_marker_is_not_split():
    # Content-Length jumps MUST win over scanning: a payload embedding
    # a full record header must stay one payload
    evil = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake\r\n\r\n"
    data = warc_file_bytes([("response", "u", evil), ("response", "v", b"x")])
    got = parse_warc_bytes(data)
    assert len(got) == 2 and got[0]["payload"] == evil and got[1]["payload"] == b"x"


def test_trailing_garbage_becomes_error_row_not_exception():
    data = warc_file_bytes([("response", "u", b"ok")]) + b"NOT A RECORD"
    got = parse_warc_bytes(data)
    assert [r["rec_type"] for r in got] == ["response", "error"]
    assert got[1]["payload"] == b"NOT A RECORD"


def test_read_warc_distributed_multi_file(spark, tmp_path: Path):
    for i, gz in ((0, True), (1, False)):
        recs = [
            ("response", f"https://s{i}.example/{j}", f"doc {i}-{j}".encode())
            for j in range(5)
        ]
        suffix = ".warc.gz" if gz else ".warc"
        (tmp_path / f"f{i}{suffix}").write_bytes(warc_file_bytes(recs, gz=gz))
    df = read_warc(spark, str(tmp_path / "f*.warc*"))
    rows = df.collect()
    assert len(rows) == 10
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file, []).append(r)
    assert set(by_file) == {"f0.warc.gz", "f1.warc"}
    assert all(
        bytes(r.payload).decode().startswith("doc ") and r.rec_type == "response"
        for r in rows
    )
    assert {r.target_uri for r in by_file["f0.warc.gz"]} == {
        f"https://s0.example/{j}" for j in range(5)
    }
