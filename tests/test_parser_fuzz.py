"""Crash-freedom fuzzing: at 10^12 documents every weird byte sequence
occurs.  The parser must either return a feed dict or raise ValueError —
never any other exception type (those would fail Spark tasks instead of
producing error rows)."""

import random
from pathlib import Path

import pytest

from ffp_spark.feedparse import parse_feed

FIXTURES = sorted(Path("/root/reference/tests/integration").glob("*.xml"))


def _outcome(payload):
    try:
        out = parse_feed(payload)
        assert isinstance(out, dict) and "entries" in out
        return "ok"
    except ValueError:
        return "error"
    # anything else propagates and fails the test


def test_random_bytes_never_crash():
    rng = random.Random(1234)
    for _ in range(300):
        n = rng.randint(0, 2000)
        payload = bytes(rng.getrandbits(8) for _ in range(n))
        _outcome(payload)


def test_truncated_fixtures_never_crash():
    rng = random.Random(99)
    for f in FIXTURES:
        data = f.read_bytes()
        for _ in range(6):
            cut = rng.randint(0, len(data))
            _outcome(data[:cut])


def test_mutated_fixtures_never_crash():
    rng = random.Random(7)
    for f in FIXTURES[:6]:
        data = bytearray(f.read_bytes()[:20000])
        for _ in range(8):
            mutated = bytearray(data)
            for _ in range(rng.randint(1, 30)):
                pos = rng.randrange(len(mutated))
                mutated[pos] = rng.getrandbits(8)
            _outcome(bytes(mutated))


def test_pathological_structures_never_crash():
    cases = [
        b"<?xml version='1.0'?>" + b"<a>" * 2000 + b"</a>" * 2000,  # deep nesting
        b"<?xml version='1.0'?><rss version='2.0'><channel>" + b"<item/>" * 5000 + b"</channel></rss>",
        b"<rss><channel><title>" + b"x" * 1_000_000 + b"</title></channel></rss>",
        b"{" + b'"items": [' + b'{"id": "x"},' * 1000 + b'{"id": "y"}]}',
        b"\xff\xfe" + "<rss><channel><title>utf16</title></channel></rss>".encode("utf-16-le"),
        b"<?xml version='1.0' encoding='windows-1252'?><rss version='2.0'><channel><title>caf\xe9</title><item><title>e</title></item></channel></rss>",
    ]
    for payload in cases:
        _outcome(payload)


def test_deep_nesting_in_item_content():
    # expat has no recursion limit issue (iterative), but our serializer
    # recurses: make sure xhtml-style nesting inside content is bounded-safe
    inner = b"<div>" * 500 + b"text" + b"</div>" * 500
    xml = (
        b"<?xml version='1.0'?><feed xmlns='http://www.w3.org/2005/Atom'>"
        b"<title>t</title><entry><id>e1</id>"
        b"<content type='xhtml'>" + inner + b"</content></entry></feed>"
    )
    out = parse_feed(xml)
    assert out["entries"][0]["content"][0]["value"]


def test_decompress_path_exception_tightness():
    """_maybe_decompress must raise ValueError (-> error row) or return
    bytes — never zlib.error/gzip/OSError — for any input, with or
    without a declared content_encoding."""
    import gzip as _gzip
    import zlib as _zlib

    from ffp_spark.udfs import _maybe_decompress

    rng = random.Random(77)
    encodings = [None, "", "gzip", "deflate", "br", "x-gzip", "identity", "weird"]
    fixture = FIXTURES[0].read_bytes() if FIXTURES else b"<rss/>"
    seeds = [
        b"", b"\x1f\x8b", b"\x1f\x8b\x08\x00garbage", b"\x78\x9c", b"\x78\x9cxx",
        b"\x78\x01", b"\x78\xda\x00", b"xml starts here",
        _gzip.compress(fixture), _zlib.compress(fixture),
        _gzip.compress(fixture)[:20],  # truncated stream
        _zlib.compress(fixture)[:10],
    ]
    for _ in range(200):
        n = rng.randint(0, 400)
        seeds.append(bytes(rng.getrandbits(8) for _ in range(n)))
    for payload in seeds:
        for enc in encodings:
            try:
                out = _maybe_decompress(payload, enc)
                assert isinstance(out, bytes)
            except ValueError:
                pass
            # any other exception type propagates and fails the test


def test_gzip_roundtrip_of_every_fixture_parses_identically():
    import gzip as _gzip

    for f in FIXTURES:
        raw = f.read_bytes()
        try:
            want = parse_feed(raw)
        except ValueError:
            continue
        from ffp_spark.udfs import _maybe_decompress

        got = parse_feed(_maybe_decompress(_gzip.compress(raw), None))
        assert got == want, f.name


class TestWebExtractorFuzz:
    """The round-6 secondary consumers of the HTML-soup bridge
    (links / canonicals / hreflang / WET text / WAT metadata) must
    NEVER raise on any byte sequence — a crash inside mapInArrow
    fails the Spark task instead of yielding an empty/NULL row."""

    def _payloads(self):
        rng = random.Random(4242)
        for _ in range(120):
            n = rng.randint(0, 1500)
            yield bytes(rng.getrandbits(8) for _ in range(n))
        # structured-ish adversaries
        yield b"<a href='" + bytes(range(256)) + b"'>x</a>"
        yield b"<link rel=alternate hreflang href>"
        yield b"<p>" * 500
        yield b"<script>" + b"\x00" * 64
        yield "<title>  </title>".encode("utf-8")
        yield b"<meta name=description content>"
        yield b"<a href=http://[::1]:80/x>v6</a>"  # urljoin ValueError path
        yield b"<div>" * 5000 + b"deep" + b"</div>" * 5000  # recursion bomb

    def test_extractors_never_raise(self):
        from ffp_spark.weblinks import (
            canonical_of,
            extract_link_rows,
            hreflang_rows,
        )
        from ffp_spark.wat import page_metadata
        from ffp_spark.wet import page_text

        for payload in self._payloads():
            assert isinstance(extract_link_rows("https://x/", payload), list)
            canonical_of("https://x/", payload)
            assert isinstance(hreflang_rows("https://x/", payload), list)
            t = page_text(payload)
            assert t is None or isinstance(t, str)
            m = page_metadata(payload)
            assert m is None or isinstance(m, dict)
