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
