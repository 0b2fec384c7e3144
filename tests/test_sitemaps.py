"""Sitemap source (ffp_spark.sitemaps): urlset/sitemapindex parsing,
error rows, and one-level index lineage resolution.

The reference treats these roots as errors (main.py:615-617); here
they are a URL-discovery source, exercising the same prep + parse
ladder and the F1 date cascade."""

from __future__ import annotations

from ffp_spark.sitemaps import (
    parse_sitemap_rows,
    parse_sitemaps,
    sitemap_frontier,
)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(*entries: str) -> bytes:
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset {_NS}>'
        + "".join(entries)
        + "</urlset>"
    ).encode()


def test_parse_urlset_fields_dates_and_junk_priority():
    body = _urlset(
        "<url><loc>https://a.example/page1</loc>"
        "<lastmod>2004-10-01</lastmod>"
        "<changefreq>Daily</changefreq><priority>0.8</priority></url>",
        "<url><loc>https://a.example/page2</loc>"
        "<lastmod>2004-10-01T18:23:17+02:00</lastmod>"
        "<priority>not-a-number</priority></url>",
        "<url><loc>/relative</loc><lastmod>garbage date</lastmod></url>",
        "<url><changefreq>weekly</changefreq></url>",  # loc-less entry
    )
    rows = parse_sitemap_rows("https://a.example/sitemap.xml", body)
    assert [r["kind"] for r in rows] == ["urlset"] * 4
    assert rows[0]["loc"] == "https://a.example/page1"
    assert rows[0]["lastmod"] == "2004-10-01T00:00:00+00:00"  # W3C date, F1
    assert rows[0]["changefreq"] == "daily" and rows[0]["priority"] == 0.8
    assert rows[1]["lastmod"] == "2004-10-01T16:23:17+00:00"  # tz-normalized
    assert rows[1]["priority"] is None  # F13 try-cast
    assert rows[2]["loc"] == "https://a.example/relative"  # urljoin rescue
    assert rows[2]["lastmod"] is None
    assert rows[3]["loc"] is None


def test_non_sitemap_and_broken_xml_are_error_rows():
    rss = b'<?xml version="1.0"?><rss version="2.0"><channel/></rss>'
    rows = parse_sitemap_rows("https://a.example/sm.xml", rss)
    assert len(rows) == 1 and rows[0]["kind"] == "error"
    assert "not a sitemap" in rows[0]["error"]
    # a feed root is a USER error here, symmetric to the reference
    # rejecting sitemap roots as feeds (main.py:615-617)
    broken = b"<urlset><url><loc>htt"
    rows = parse_sitemap_rows("https://a.example/sm.xml", broken)
    # salvage ladder may recover a prefix or fail; either way: no raise,
    # and anything recovered is a well-formed row
    assert all(r["kind"] in ("urlset", "error") for r in rows)


def test_frontier_resolves_one_index_level(spark):
    index = (
        f'<sitemapindex {_NS}>'
        "<sitemap><loc>https://a.example/sm-a.xml</loc>"
        "<lastmod>2020-01-02</lastmod></sitemap>"
        "<sitemap><loc>https://a.example/sm-b.xml</loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    sm_a = _urlset("<url><loc>https://a.example/1</loc></url>")
    sm_b = _urlset("<url><loc>https://a.example/2</loc></url>",
                   "<url><loc>https://a.example/3</loc></url>")
    root = _urlset("<url><loc>https://b.example/x</loc></url>")
    docs = spark.createDataFrame(
        [
            ("https://a.example/sitemap.xml", index),
            ("https://a.example/sm-a.xml", sm_a),
            ("https://a.example/sm-b.xml", sm_b),
            ("https://b.example/sitemap.xml", root),
        ],
        "url string, body binary",
    )
    parsed = parse_sitemaps(docs)
    kinds = {r.kind for r in parsed.collect()}
    assert kinds == {"urlset", "sitemapindex"}
    frontier = {r.loc: r.via_index for r in sitemap_frontier(parsed).collect()}
    assert frontier == {
        "https://a.example/1": "https://a.example/sitemap.xml",
        "https://a.example/2": "https://a.example/sitemap.xml",
        "https://a.example/3": "https://a.example/sitemap.xml",
        "https://b.example/x": None,
    }


class TestRobotsSitemapDiscovery:
    def test_directive_extraction_contract(self, spark):
        from ffp_spark.sitemaps import sitemap_urls_from_robots

        body = "\n".join(
            [
                "# Sitemap: https://h/commented.xml",
                "User-agent: *",
                "Disallow: /x",
                "Sitemap: https://h/a.xml",
                "  sitemap :   https://h/b.xml  ",
                "SITEMAP:https://h/c.xml",
                "Sitemap:",  # empty value drops
                "Sitemap: https://h/tail.xml # trailing comment",
            ]
        )
        robots = spark.createDataFrame(
            [("h.example", body)], "host string, body string"
        )
        got = [
            (r.ln, r.sitemap_url)
            for r in sitemap_urls_from_robots(robots).orderBy("ln").collect()
        ]
        assert got == [
            (3, "https://h/a.xml"),
            (4, "https://h/b.xml"),
            (5, "https://h/c.xml"),
            (7, "https://h/tail.xml"),
        ]

    def test_no_shuffle_plan(self, spark):
        from ffp_spark.sitemaps import sitemap_urls_from_robots

        robots = spark.createDataFrame(
            [("h", "Sitemap: https://h/a.xml")], "host string, body string"
        )
        plan = (
            sitemap_urls_from_robots(robots)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # pure map-side explode + filter
