"""WAT-style metadata extraction (ffp_spark.wat)."""

from __future__ import annotations

from ffp_spark.wat import page_metadata, wat_records


def test_title_desc_and_counts():
    html = b"""<html><head><title>My
        Spaced   Title</title>
      <meta NAME="DESCRIPTION" content="the summary">
      <meta name="keywords" content="ignored">
      </head><body>
        <a href="/one">1</a><a href="https://x/">2</a>
        <a href="">empty does not count</a>
        <a>no href</a>
        <img src="a.png"><img src="b.png">
        <script>code()</script>
      </body></html>"""
    assert page_metadata(html) == {
        "title": "My Spaced Title",
        "meta_description": "the summary",
        "n_links": 2,
        "n_images": 2,
        "n_scripts": 1,
    }


def test_first_title_and_first_description_win():
    html = b"""<title>First</title><title>Second</title>
      <meta name="description" content="one">
      <meta name="description" content="two">"""
    meta = page_metadata(html)
    assert meta["title"] == "First"
    assert meta["meta_description"] == "one"


def test_absent_fields_are_null_counts_zero():
    meta = page_metadata(b"<html><body><p>no meta at all</p></body></html>")
    assert meta == {
        "title": None,
        "meta_description": None,
        "n_links": 0,
        "n_images": 0,
        "n_scripts": 0,
    }


def test_unparseable_yields_none():
    assert page_metadata(b"\xff\x00<<<") is None


def test_wat_records_stage(spark):
    pages = spark.createDataFrame(
        [
            ("https://a/", '<title>T</title><a href="/x">l</a>'),
            ("https://b/", None),
        ],
        "url string, html string",
    )
    got = {
        r.url: (r.title, r.n_links, r.n_images, r.n_scripts)
        for r in wat_records(pages).collect()
    }
    assert got["https://a/"] == ("T", 1, 0, 0)
    assert got["https://b/"] == (None, None, None, None)
