"""WET-style plain-text extraction (ffp_spark.wet)."""

from __future__ import annotations

from ffp_spark.wet import page_text, wet_records


def test_blocks_inline_and_skip_tags():
    html = b"""<html><head><title>My  Title</title>
      <script>var hidden = 1;</script><style>.x{}</style></head>
      <body>
        <h1>Header</h1>
        <p>one <b>two</b> three</p>
        <div>left<span> mid </span>right</div>
        <noscript>fallback junk</noscript>
        <ul><li>a</li><li>b</li></ul>
      </body></html>"""
    assert page_text(html) == (
        "My Title\nHeader\none two three\nleft mid right\na\nb"
    )


def test_br_breaks_lines_and_empty_lines_drop():
    assert page_text(b"<p>first<br>second</p><p>  </p>") == "first\nsecond"


def test_script_tail_text_survives():
    # only the script's CONTENT is dropped; text after it still flows
    assert page_text(b"<div><script>x()</script>after</div>") == "after"


def test_unparseable_yields_none():
    assert page_text(b"\x00\xff<<<garbage") is None


def test_wet_records_stage(spark):
    pages = spark.createDataFrame(
        [
            ("https://a/", "<p>two words</p>"),
            ("https://b/", "<p>three  tokens here</p>"),
            ("https://c/", None),
        ],
        "url string, html string",
    )
    got = {
        r.url: (r.text, r.n_words, r.n_chars)
        for r in wet_records(pages).collect()
    }
    assert got["https://a/"] == ("two words", 2, 9)
    assert got["https://b/"] == ("three tokens here", 3, 17)
    assert got["https://c/"] == (None, None, None)
