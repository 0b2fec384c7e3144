"""End-to-end web-analytics tier: .warc.gz -> HTTP split -> PAGES ->
{WET text, WAT metadata, anchor links} -> host graph -> registrable
domains -> weighted PageRank -> crawl-budget allocation.

The round-6 web tier composed the way a crawl platform actually runs
it, from archive bytes to per-domain fetch budgets.  The checks are
cross-stage INVARIANTS (each stage already has its own oracle):
the WAT link counts equal the link extractor's per-page rows, the
WET text matches the synthesized content exactly, domains collapse
the host fan-out, and the final budget conserves exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffp_spark.domains import domain_link_graph
from ffp_spark.frontier import allocate_budget
from ffp_spark.graph import pagerank
from ffp_spark.pipeline import pages_from_warc
from ffp_spark.sources import warc_file_bytes
from ffp_spark.wat import wat_records
from ffp_spark.weblinks import extract_links, host_link_graph
from ffp_spark.wet import wet_records


def _page(i: int) -> tuple[str, bytes]:
    url = f"https://s{i % 4}.example.co.uk/doc/{i}"
    html = (
        f"<html><head><title>Doc {i}</title></head><body>"
        f"<h1>Head {i}</h1><p>alpha beta {i}</p>"
        f'<a href="https://t{i % 3}.github.io/p">out {i}</a>'
        f'<a href="/local/{i}">in {i}</a>'
        "</body></html>"
    ).encode()
    return url, html


def test_warc_to_budget_pipeline(spark, tmp_path):
    n = 24
    pages_src = dict(_page(i) for i in range(n))
    recs = [
        (
            "response",
            url,
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body,
            "2020-03-01T00:00:00Z",
        )
        for url, body in sorted(pages_src.items())
    ]
    (tmp_path / "w.warc.gz").write_bytes(warc_file_bytes(recs, gz=True))

    pages = pages_from_warc(spark, str(tmp_path / "w.warc.gz"))
    assert pages.count() == n

    # WET: extracted text is exactly the synthesized content
    wet = {r.url: r for r in wet_records(pages).collect()}
    for i in range(n):
        url, _ = _page(i)
        assert wet[url].text == (
            f"Doc {i}\nHead {i}\nalpha beta {i}\nout {i}in {i}"
        ), wet[url].text
        assert wet[url].n_words == 10

    # WAT link counts == link-extractor rows per page
    wat = {r.url: r.n_links for r in wat_records(pages).collect()}
    links = extract_links(pages)
    per_page = {
        r.url: r.n for r in links.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    assert wat == per_page == {u: 2 for u in pages_src}

    # host graph -> domain quotient: 4 subdomain hosts collapse onto
    # one src domain; 3 distinct target domains
    hg = host_link_graph(links, include_self=False)
    dg = domain_link_graph(hg)
    rows = {(r.src_domain, r.dst_domain): r.weight for r in dg.collect()}
    # github.io is a PSL rule: each t<j> subdomain is its OWN site,
    # while the four s<k> source hosts collapse onto one co.uk domain
    assert set(rows) == {
        ("example.co.uk", f"t{j}.github.io") for j in range(3)
    }
    assert sum(rows.values()) == n  # every cross-host link lands once

    # PageRank over the domain graph -> budgets conserve exactly
    pr = pagerank(
        dg.select(
            F.col("src_domain").alias("src"),
            F.col("dst_domain").alias("dst"),
            "weight",
        ),
        iters=2,
        weight="weight",
    )
    alloc = allocate_budget(
        pr.select(F.col("node").alias("domain"), F.col("pr_q").alias("score")),
        100_000,
    )
    got = {r.domain: r.alloc for r in alloc.collect()}
    assert sum(got.values()) == 100_000
    assert set(got) == {"example.co.uk"} | {
        f"t{j}.github.io" for j in range(3)
    }
    # the three sinks split the endorsement; the source only keeps
    # teleport mass, so every sink out-budgets it
    assert all(got[f"t{j}.github.io"] > got["example.co.uk"] for j in range(3))
