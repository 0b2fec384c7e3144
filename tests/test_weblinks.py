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


class TestCanonicalOf:
    def test_absolute_relative_and_fragment(self):
        from ffp_spark.weblinks import canonical_of

        page = "https://a.example/doc/44"
        assert canonical_of(
            page, b'<link rel="canonical" href="https://b.example/p#frag">'
        ) == "https://b.example/p"
        assert canonical_of(
            page, b'<head><link rel="canonical" href="/doc/42"></head>'
        ) == "https://a.example/doc/42"

    def test_none_when_absent_or_unparseable(self):
        from ffp_spark.weblinks import canonical_of

        page = "https://a.example/"
        assert canonical_of(page, b"<html><head></head></html>") is None
        assert canonical_of(page, b"") is None
        # stylesheet links and anchors are not canonicals
        assert canonical_of(
            page,
            b'<link rel="stylesheet" href="/s.css"><a href="/x">x</a>',
        ) is None

    def test_rel_token_list_and_case(self):
        from ffp_spark.weblinks import canonical_of

        assert canonical_of(
            "https://a.example/", b'<link REL="Canonical alternate" href="/x">'
        ) == "https://a.example/x"

    def test_first_declaration_wins(self):
        from ffp_spark.weblinks import canonical_of

        html = (
            b'<link rel="canonical" href="/first">'
            b'<link rel="canonical" href="/second">'
        )
        assert canonical_of("https://a.example/", html) == "https://a.example/first"


def test_extract_canonicals_stage(spark):
    from ffp_spark.weblinks import extract_canonicals

    pages = spark.createDataFrame(
        [
            ("https://a.example/v1",
             b'<head><link rel="canonical" href="/main"></head>'),
            ("https://a.example/main", b"<html><body>no decl</body></html>"),
        ],
        "url string, html binary",
    )
    got = {r.url: r.canonical for r in extract_canonicals(pages).collect()}
    assert got == {
        "https://a.example/v1": "https://a.example/main",
        "https://a.example/main": None,
    }


class TestSurtKey:
    def _surt(self, spark, url):
        from ffp_spark.weblinks import surt_key

        df = spark.createDataFrame([(url,)], "url string")
        return df.select(surt_key("url").alias("s")).collect()[0].s

    def test_full_messy_url(self, spark):
        assert (
            self._surt(
                spark, "HTTPS://WWW.News.Example.com:443/A/b?z=2&a=1#frag"
            )
            == "com,example,news)/A/b?a=1&z=2"
        )

    def test_empty_path_and_default_port(self, spark):
        assert self._surt(spark, "http://example.com:80") == "com,example)/"
        assert self._surt(spark, "https://sub.example.org/") == "org,example,sub)/"

    def test_non_default_port_kept(self, spark):
        assert self._surt(spark, "http://example.com:8080/x") == "com,example:8080)/x"

    def test_path_case_preserved_query_sorted(self, spark):
        assert (
            self._surt(spark, "https://Example.com/CaseSensitive?b=1&B=0")
            == "com,example)/CaseSensitive?B=0&b=1"
        )

    def test_sort_contiguity(self, spark):
        """The property SURT exists for: one registered domain's pages
        sort CONTIGUOUSLY even across hosts and schemes."""
        from ffp_spark.weblinks import surt_key

        urls = [
            "https://a.example.com/1",
            "https://zz-unrelated.org/x",
            "http://b.example.com/2",
            "https://example.com/root",
            "https://aardvark.net/y",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [r.s for r in df.select(surt_key("url").alias("s")).orderBy("s").collect()]
        in_domain = [s for s in got if s.startswith("com,example")]
        lo, hi = got.index(in_domain[0]), got.index(in_domain[-1])
        assert hi - lo + 1 == len(in_domain) == 3


class TestAnchorTextIndex:
    def _links(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, href string, anchor string, nofollow boolean"
        )

    def test_topk_rank_counts_and_tiebreak(self, spark):
        from ffp_spark.weblinks import anchor_text_index

        rows = (
            # target T: "Click here" x3 from 2 pages, brands 1x each
            [("https://p1/", "https://T/", "Click here", False)] * 2
            + [
                ("https://p2/", "https://T/", "Click here", False),
                ("https://p1/", "https://T/", "Beta", False),
                ("https://p2/", "https://T/", "Alpha", False),
                ("https://p3/", "https://T/", "Gamma", False),
                # another target entirely
                ("https://p1/", "https://U/", "Only one", False),
            ]
        )
        got = [
            (r.target, r.rank, r.anchor, r.n_links, r.n_pages)
            for r in anchor_text_index(self._links(spark, rows), k=3)
            .orderBy("target", "rank")
            .collect()
        ]
        assert got == [
            # count-tied brands break by anchor text asc; Gamma is cut by k=3
            ("https://T/", 1, "Click here", 3, 2),
            ("https://T/", 2, "Alpha", 1, 1),
            ("https://T/", 3, "Beta", 1, 1),
            ("https://U/", 1, "Only one", 1, 1),
        ]

    def test_null_anchors_excluded(self, spark):
        from ffp_spark.weblinks import anchor_text_index

        rows = [
            ("https://p1/", "https://T/", None, False),
            ("https://p1/", "https://T/", "real", False),
        ]
        got = anchor_text_index(self._links(spark, rows), k=5).collect()
        assert [(r.anchor, r.n_links) for r in got] == [("real", 1)]


class TestHreflang:
    def test_extraction_contract(self):
        from ffp_spark.weblinks import hreflang_rows

        html = b"""<html><head>
          <link rel="Alternate" hreflang="EN-us" href="https://x/en#top">
          <link rel="alternate" hreflang="de" href="/de/page">
          <link rel="alternate stylesheet" hreflang="fr" href="/fr">
          <link rel="alternate" href="/feed.xml">
          <link rel="alternate" hreflang="" href="/empty">
          <link rel="canonical" hreflang="es" href="/not-alternate-rel">
        </head></html>"""
        rows = hreflang_rows("https://site.example/dir/p", html)
        got = {(r["hreflang"], r["href"]) for r in rows}
        assert got == {
            ("en-us", "https://x/en"),             # lowercased, fragment gone
            ("de", "https://site.example/de/page"),  # urljoin resolved
            ("fr", "https://site.example/fr"),     # multi-token rel still alternate
        }

    def test_unparseable_yields_no_rows(self):
        from ffp_spark.weblinks import hreflang_rows

        assert hreflang_rows("https://x/", b"\x00garbage<<<") == []

    def test_stage(self, spark):
        from ffp_spark.weblinks import extract_hreflangs

        pages = spark.createDataFrame(
            [("https://a/", '<link rel="alternate" hreflang="en" href="/e">')],
            "url string, html string",
        )
        rows = extract_hreflangs(pages).collect()
        assert [(r.hreflang, r.href) for r in rows] == [("en", "https://a/e")]


class TestHostGraphDelta:
    def test_statuses_and_weight_deltas(self, spark):
        from ffp_spark.weblinks import host_graph_delta

        old = spark.createDataFrame(
            [("a", "b", 3), ("a", "c", 1)],
            "src_host string, dst_host string, weight long",
        )
        new = spark.createDataFrame(
            [("a", "b", 5), ("a", "d", 2)],
            "src_host string, dst_host string, weight long",
        )
        got = {
            (r.src_host, r.dst_host): (r.status, r.old_weight, r.new_weight,
                                       r.weight_delta)
            for r in host_graph_delta(old, new).collect()
        }
        assert got == {
            ("a", "b"): ("persisted", 3, 5, 2),
            ("a", "c"): ("removed", 1, None, -1),
            ("a", "d"): ("added", None, 2, 2),
        }
