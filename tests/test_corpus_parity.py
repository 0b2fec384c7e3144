"""Spark-path parity over the reference's 200-feed benchmark cache:
the distributed parse must agree with the in-process parser row by row
(entry counts + error behavior), and meta-refresh redirects must be
recorded as resolvable error rows."""

import pytest

from ffp_spark.datagen import BENCHMARK_CORPUS, corpus_pages
from ffp_spark.udfs import parse_pages


@pytest.mark.skipif(not BENCHMARK_CORPUS.exists(), reason="no benchmark corpus")
def test_benchmark_corpus_spark_matches_inprocess(spark):
    from ffp_spark.feedparse import parse_feed

    expected: dict[str, int] = {}
    for f in sorted(BENCHMARK_CORPUS.glob("*")):
        url = f"https://corpus.example/0/{f.name}"
        try:
            expected[url] = len(parse_feed(f.read_bytes())["entries"])
        except Exception:
            expected[url] = -1

    parsed = parse_pages(corpus_pages(spark))
    rows = parsed.selectExpr(
        "url", "coalesce(size(entries), -1) as n", "error"
    ).collect()
    assert len(rows) == len(expected)
    bad = [(r.url, r.n, expected[r.url]) for r in rows if r.n != expected[r.url]]
    assert bad == [], bad[:5]


def test_meta_refresh_recorded_as_error_row(spark):
    html = (
        b"<!DOCTYPE html><html><head>"
        b'<meta http-equiv="refresh" content="0; url=https://n.example/feed.xml">'
        b"</head><body>moved</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://o.example/", None, bytearray(html), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    row = parse_pages(pages).collect()[0]
    assert row.error_class == "meta_refresh"
    assert row.error == "meta_refresh:https://n.example/feed.xml"


_RSS = (
    b'<?xml version="1.0"?><rss version="2.0"><channel>'
    b"<title>Target Feed</title><link>https://t.example/</link>"
    b"<description>d</description>"
    b"<item><title>A</title><link>https://t.example/a</link></item>"
    b"<item><title>B</title><link>https://t.example/b</link></item>"
    b"</channel></rss>"
)

_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _redirect_html(target: str) -> bytes:
    return (
        b"<!DOCTYPE html><html><head>"
        b'<meta http-equiv="refresh" content="0; url=' + target.encode() + b'">'
        b"</head><body>moved</body></html>"
    )


class TestMetaRefreshResolution:
    def test_redirect_to_in_corpus_feed_resolves(self, spark):
        from ffp_spark.pipeline import resolve_meta_refresh

        pages = spark.createDataFrame(
            [
                ("https://o.example/", None, bytearray(_redirect_html("https://t.example/feed.xml")), None, "en"),
                ("https://t.example/feed.xml", None, bytearray(_RSS), None, "en"),
            ],
            _PAGES_DDL,
        )
        parsed = parse_pages(pages)
        resolved = resolve_meta_refresh(parsed, pages)
        rows = {r.url: r for r in resolved.collect()}
        assert len(rows) == 2
        # the redirecting url now carries its TARGET's parse result
        orig = rows["https://o.example/"]
        assert orig.error is None and orig.error_class is None
        assert orig.feed.title == "Target Feed"
        assert len(orig.entries) == 2
        # the target itself still parses under its own url
        assert rows["https://t.example/feed.xml"].feed.title == "Target Feed"

    def test_redirect_to_missing_target_keeps_error_row(self, spark):
        from ffp_spark.pipeline import resolve_meta_refresh

        pages = spark.createDataFrame(
            [("https://o.example/", None, bytearray(_redirect_html("https://gone.example/feed.xml")), None, "en")],
            _PAGES_DDL,
        )
        parsed = parse_pages(pages)
        row = resolve_meta_refresh(parsed, pages).collect()[0]
        assert row.error_class == "meta_refresh"
        assert row.error == "meta_refresh:https://gone.example/feed.xml"

    def test_redirect_to_html_target_keeps_target_error(self, spark):
        from ffp_spark.pipeline import resolve_meta_refresh

        plain_html = b"<!DOCTYPE html><html><body>just a page</body></html>"
        pages = spark.createDataFrame(
            [
                ("https://o.example/", None, bytearray(_redirect_html("https://t.example/page.html")), None, "en"),
                ("https://t.example/page.html", None, bytearray(plain_html), None, "en"),
            ],
            _PAGES_DDL,
        )
        parsed = parse_pages(pages)
        rows = {r.url: r for r in resolve_meta_refresh(parsed, pages).collect()}
        # target parsed, but it is an HTML page -> its error propagates
        assert rows["https://o.example/"].error_class == "html_page"

    def test_lineage_counts_resolution_in_run_snapshot(self, spark, tmp_path):
        from ffp_spark.pipeline import run_snapshot
        from ffp_spark.snapshots import read_manifest

        pages = spark.createDataFrame(
            [
                ("https://o.example/", None, bytearray(_redirect_html("https://t.example/feed.xml")), None, "en"),
                ("https://t.example/feed.xml", None, bytearray(_RSS), None, "en"),
            ],
            _PAGES_DDL,
        )
        rep = run_snapshot(spark, pages, str(tmp_path), snapshot_id=1, n_parts=4)
        assert rep["pages"] == 2
        # both rows parsed: the redirect was resolved, so no error classes
        assert rep["errors"] == {}


class TestStoredPayloadDecompression:
    def test_gzip_payload_parses_to_same_result(self, spark):
        import gzip

        pages = spark.createDataFrame(
            [
                ("https://a.example/feed", None, bytearray(_RSS), None, "en"),
                ("https://b.example/feed", None, bytearray(gzip.compress(_RSS)), None, "en"),
            ],
            _PAGES_DDL,
        )
        rows = {r.url: r for r in parse_pages(pages).collect()}
        a, b = rows["https://a.example/feed"], rows["https://b.example/feed"]
        assert b.error is None
        assert a.feed == b.feed and a.entries == b.entries

    def test_zlib_payload_sniffed_by_header_checksum(self, spark):
        import zlib

        pages = spark.createDataFrame(
            [("https://z.example/feed", None, bytearray(zlib.compress(_RSS)), None, "en")],
            _PAGES_DDL,
        )
        row = parse_pages(pages).collect()[0]
        assert row.error is None
        assert len(row.entries) == 2

    def test_declared_encoding_column_wins(self, spark):
        import zlib

        # raw-deflate bytes (no zlib header) only decompress when the
        # content_encoding column declares deflate
        co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
        raw_deflate = co.compress(_RSS) + co.flush()
        pages = spark.createDataFrame(
            [("https://d.example/feed", None, bytearray(raw_deflate), None, "en", "deflate")],
            _PAGES_DDL + ", content_encoding string",
        )
        row = parse_pages(pages).collect()[0]
        assert row.error is None and len(row.entries) == 2

    def test_corrupt_gzip_is_error_row_not_task_failure(self, spark):
        pages = spark.createDataFrame(
            [("https://c.example/feed", None, bytearray(b"\x1f\x8b garbage"), None, "en")],
            _PAGES_DDL,
        )
        row = parse_pages(pages).collect()[0]
        assert row.error_class == "decompress_error"

    def test_brotli_declared_without_library_is_error_row(self, spark):
        pages = spark.createDataFrame(
            [("https://br.example/feed", None, bytearray(b"\x8b\x02\x80data"), None, "en", "br")],
            _PAGES_DDL + ", content_encoding string",
        )
        row = parse_pages(pages).collect()[0]
        # brotli isn't shipped in this sandbox -> deterministic error row
        assert row.error_class == "decompress_error"
        assert "brotli" in row.error

    def test_duplicate_target_rows_do_not_fan_out(self, spark):
        from ffp_spark.pipeline import resolve_meta_refresh

        # the target url appears TWICE in PAGES (re-crawl): the
        # redirecting row must still resolve to exactly one output row
        pages = spark.createDataFrame(
            [
                ("https://o.example/", None, bytearray(_redirect_html("https://t.example/feed.xml")), None, "en"),
                ("https://t.example/feed.xml", None, bytearray(_RSS), None, "en"),
                ("https://t.example/feed.xml", None, bytearray(_RSS), None, "en"),
            ],
            _PAGES_DDL,
        )
        parsed = parse_pages(pages)
        resolved = resolve_meta_refresh(parsed, pages)
        n = resolved.filter("url = 'https://o.example/'").count()
        assert n == 1

    def test_incremental_run_resolves_target_seen_by_parent(self, spark, tmp_path):
        from ffp_spark.pipeline import run_snapshot
        from ffp_spark.snapshots import read_snapshot

        target = ("https://t.example/feed.xml", None, bytearray(_RSS), None, "en")
        base = spark.createDataFrame([target], _PAGES_DDL)
        run_snapshot(spark, base, str(tmp_path), snapshot_id=1, n_parts=4)
        # snapshot 2 adds only the redirecting page; its target was seen
        # by the parent — resolution must still find it in the corpus
        grown = spark.createDataFrame(
            [
                target,
                ("https://o.example/", None, bytearray(_redirect_html("https://t.example/feed.xml")), None, "en"),
            ],
            _PAGES_DDL,
        )
        rep = run_snapshot(
            spark, grown, str(tmp_path), snapshot_id=2, n_parts=4, incremental_from=1
        )
        assert rep["pages"] == 1  # only the delta parsed
        assert rep["errors"] == {}  # the redirect resolved, not an error

    def test_redirect_chain_resolves_through_two_hops(self, spark):
        from ffp_spark.pipeline import resolve_meta_refresh

        # A -> B -> C, C is the feed: A and B both end up with C's parse
        pages = spark.createDataFrame(
            [
                ("https://a.example/", None, bytearray(_redirect_html("https://b.example/")), None, "en"),
                ("https://b.example/", None, bytearray(_redirect_html("https://c.example/feed.xml")), None, "en"),
                ("https://c.example/feed.xml", None, bytearray(_RSS), None, "en"),
            ],
            _PAGES_DDL,
        )
        rows = {r.url: r for r in resolve_meta_refresh(parse_pages(pages), pages).collect()}
        assert rows["https://a.example/"].feed.title == "Target Feed"
        assert rows["https://b.example/"].feed.title == "Target Feed"
        assert rows["https://c.example/feed.xml"].feed.title == "Target Feed"

    def test_redirect_cycle_terminates_with_error_row(self, spark):
        from ffp_spark.pipeline import resolve_meta_refresh

        pages = spark.createDataFrame(
            [
                ("https://a.example/", None, bytearray(_redirect_html("https://b.example/")), None, "en"),
                ("https://b.example/", None, bytearray(_redirect_html("https://a.example/")), None, "en"),
            ],
            _PAGES_DDL,
        )
        rows = {r.url: r for r in resolve_meta_refresh(parse_pages(pages), pages).collect()}
        assert len(rows) == 2
        for r in rows.values():
            assert r.error_class == "meta_refresh"  # bounded, no hang
