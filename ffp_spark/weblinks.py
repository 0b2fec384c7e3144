"""Anchor-text link extraction: HTML pages -> the web-link edge table.

The hyperlink graph is the other half of KG construction at crawl
scale (the CommonCrawl host-webgraph product): (src url, resolved
href, anchor text, nofollow) edges, contracted onto hosts downstream
— host_link_graph composes graph.contract_graph's plan shape (two
host projections + one partially-aggregated count) without the
intermediate node table.

Extraction rides the existing HTML-soup bridge (_SoupBuilder,
feedparse/htmlsoup.py — the same forgiving parser the meta-refresh
rescue S3 uses), href resolution through urljoin (F12 discipline),
fragments stripped, javascript:/mailto:/data:/tel: schemes and empty
hrefs dropped.  One mapInArrow hop over (url, html); only the edge
columns leave the task — anchor text is whitespace-collapsed and
capped at 512 chars so a pathological page cannot blow the batch.
Unparseable HTML contributes zero edges (page-level parse errors are
already error ROWS in the parse stage; the link extractor is a
secondary consumer and stays silent on them).
"""

from __future__ import annotations

import re
from typing import Iterable, Optional
from urllib.parse import urljoin

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

LINKS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("href", StringType(), False),
        StructField("anchor", StringType(), True),
        StructField("nofollow", BooleanType(), False),
    ]
)

_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:", "about:")
_WS = re.compile(r"\s+")


def extract_link_rows(url: str, payload: bytes) -> list[dict]:
    """One page -> link rows.  Pure function (tests + the vectorized
    stage)."""
    from .feedparse.htmlsoup import parse_html_tree

    tree = parse_html_tree(payload)
    if tree is None:
        return []
    out: list[dict] = []
    for a in tree.iter("a"):
        href = (a.get("href") or "").strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        try:
            resolved = urljoin(url, href)
        except ValueError:
            continue
        resolved = resolved.split("#", 1)[0]
        if not resolved:
            continue
        anchor = _WS.sub(" ", "".join(a.itertext())).strip()[:512]
        rel = (a.get("rel") or "").lower().split()
        out.append(
            {
                "url": url,
                "href": resolved,
                "anchor": anchor or None,
                "nofollow": "nofollow" in rel,
            }
        )
    return out


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """PAGES -> LINKS_SCHEMA edges (mapInArrow; binary payloads never
    cross pandas object arrays).  Column-prunes to (url, html) before
    the Python hop."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    src = pages.select(
        F.col(url_col).alias("url"), F.col(html_col).cast("binary").alias("html")
    )

    def run(batches: Iterable["pa.RecordBatch"]):
        out_schema = to_arrow_schema(LINKS_SCHEMA)
        for batch in batches:
            rows: list[dict] = []
            for rec in batch.to_pylist():
                payload = rec["html"] if rec["html"] is not None else b""
                rows.extend(extract_link_rows(rec["url"], bytes(payload)))
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return src.mapInArrow(run, schema=LINKS_SCHEMA)


def host_link_graph(
    links: DataFrame,
    include_self: bool = True,
    follow_only: bool = False,
) -> DataFrame:
    """LINKS -> host-level weighted edges (src_host, dst_host, weight,
    n_nofollow): the quotient the public host-webgraph ships.  Plan:
    two regexp host projections inside codegen + ONE (src,dst)-keyed
    count with map-side partial aggregation — link tables are
    E-sized, host pairs collapse before the shuffle.  ``follow_only``
    drops rel=nofollow edges (the PageRank-input convention);
    ``include_self=False`` drops intra-host edges like
    graph.contract_graph's default."""
    host = lambda c: F.regexp_extract(c, r"^[a-z]+://([^/]+)", 1)  # noqa: E731
    e = links.select(
        host("url").alias("src_host"),
        host("href").alias("dst_host"),
        "nofollow",
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if follow_only:
        e = e.where(~F.col("nofollow"))
    if not include_self:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("weight"),
        F.sum(F.col("nofollow").cast("long")).alias("n_nofollow"),
    )


CANONICAL_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("canonical", StringType(), True),
    ]
)


def canonical_of(url: str, payload: bytes) -> Optional[str]:
    """First ``<link rel="canonical" href=...>`` of a page, resolved
    against the page URL (F12 urljoin discipline), fragment stripped;
    None when the page declares no canonical or the HTML will not
    parse.  Pure function (tests + the vectorized stage)."""
    from .feedparse.htmlsoup import parse_html_tree

    tree = parse_html_tree(payload)
    if tree is None:
        return None
    for link in tree.iter("link"):
        rel = (link.get("rel") or "").lower().split()
        if "canonical" not in rel:
            continue
        href = (link.get("href") or "").strip()
        if not href:
            continue
        try:
            resolved = urljoin(url, href)
        except ValueError:
            return None
        resolved = resolved.split("#", 1)[0]
        return resolved or None
    return None


def extract_canonicals(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """PAGES -> (url, canonical) via mapInArrow (binary payloads never
    cross pandas object arrays; only two string columns leave the
    task).  ``canonical`` is NULL for pages without a declaration —
    the caller's coalesce(canonical, url) is the dedup cluster key
    (the rel=canonical duplicate-collapse every production crawl
    pipeline runs before content dedup)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    src = pages.select(
        F.col(url_col).alias("url"), F.col(html_col).cast("binary").alias("html")
    )

    def run(batches: Iterable["pa.RecordBatch"]):
        out_schema = to_arrow_schema(CANONICAL_SCHEMA)
        for batch in batches:
            rows = [
                {
                    "url": rec["url"],
                    "canonical": canonical_of(
                        rec["url"],
                        bytes(rec["html"]) if rec["html"] is not None else b"",
                    ),
                }
                for rec in batch.to_pylist()
            ]
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return src.mapInArrow(run, schema=CANONICAL_SCHEMA)


HREFLANG_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("hreflang", StringType(), False),
        StructField("href", StringType(), False),
    ]
)


def hreflang_rows(url: str, payload: bytes) -> list[dict]:
    """One page -> its declared language/region alternates:
    ``<link rel="alternate" hreflang=... href=...>`` rows, href
    urljoin-resolved (F12 discipline) with fragments stripped,
    hreflang lowercased (BCP-47 tags are case-insensitive;
    ``x-default`` marks the fallback variant).  The i18n sibling of
    the rel=canonical signal: production pipelines collapse language
    variants onto one cluster BEFORE content dedup, exactly like
    canonicals — and hreflang is how the publisher declares the
    cluster.  Pure function (tests + the vectorized stage)."""
    from .feedparse.htmlsoup import parse_html_tree

    tree = parse_html_tree(payload)
    if tree is None:
        return []
    out: list[dict] = []
    for link in tree.iter("link"):
        rel = (link.get("rel") or "").lower().split()
        if "alternate" not in rel:
            continue
        lang = (link.get("hreflang") or "").strip().lower()
        href = (link.get("href") or "").strip()
        if not lang or not href:
            continue
        try:
            resolved = urljoin(url, href)
        except ValueError:
            continue
        resolved = resolved.split("#", 1)[0]
        if not resolved:
            continue
        out.append({"url": url, "hreflang": lang, "href": resolved})
    return out


def extract_hreflangs(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """PAGES -> HREFLANG_SCHEMA alternate rows via mapInArrow (same
    stage shape as extract_links/extract_canonicals)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    src = pages.select(
        F.col(url_col).alias("url"), F.col(html_col).cast("binary").alias("html")
    )

    def run(batches: Iterable["pa.RecordBatch"]):
        out_schema = to_arrow_schema(HREFLANG_SCHEMA)
        for batch in batches:
            rows: list[dict] = []
            for rec in batch.to_pylist():
                payload = bytes(rec["html"]) if rec["html"] is not None else b""
                rows.extend(hreflang_rows(rec["url"], payload))
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return src.mapInArrow(run, schema=HREFLANG_SCHEMA)


def anchor_text_index(
    links: DataFrame, target_col: str = "href", k: int = 3
) -> DataFrame:
    """LINKS -> the top-``k`` anchor texts per link TARGET: the
    classic web-search / KG entity-naming signal (what the rest of
    the web calls a page beats what the page calls itself).

    Per (target, anchor): ``n_links`` (total mentions) and
    ``n_pages`` (distinct linking pages — the spam-resistant count);
    rank by n_links desc with anchor text as the deterministic
    tiebreak.  Plan: one (target, anchor)-keyed agg (map-side
    partial + distinct-expand for n_pages), then a row_number window
    PARTITIONED BY target — never a global sort; per-target fan-in
    is bounded by distinct anchor texts, and the heavy collapse
    (billions of links -> per-text counts) happens before the
    window ever runs."""
    from pyspark.sql.window import Window

    counts = (
        links.where(F.col("anchor").isNotNull())
        .groupBy(F.col(target_col).alias("target"), "anchor")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("url").alias("n_pages"),
        )
    )
    w = Window.partitionBy("target").orderBy(
        F.desc("n_links"), F.asc("anchor")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("target", "rank", "anchor", "n_links", "n_pages")
    )


def surt_key(url_col: str = "url"):
    """Sort-friendly URI Reordering Transform (SURT) — the key every
    production capture index (CDX/CDXJ) sorts on so one host's (and,
    with the reversed labels, one registered domain's) captures are
    CONTIGUOUS: at petabyte index scale a per-site lookup becomes a
    range scan over sorted shards instead of a full-index filter.

    ``https://WWW.News.Example.com:443/A/b?z=2&a=1#frag`` ->
    ``com,example,news)/A/b?a=1&z=2``.

    Contract (entirely JVM-side string expressions — codegen, no
    Python): fragment stripped; scheme dropped; host lowercased,
    leading ``www.`` removed, default ports (:80/:443) removed, labels
    reversed and comma-joined; path kept byte-exact (case can be
    significant on origin servers); query parameters sorted
    byte-lexicographically (the order-insensitive part of URL
    equality).  Userinfo is not handled (crawl frontiers reject
    credentialed URLs upstream)."""
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    # non-default ports survive AFTER the reversed labels
    # (org,example:8080)/...) — extracted before reversal so the port
    # never rides along inside the first label
    port = F.regexp_extract(host, ":([0-9]+)$", 1)
    hostname = F.regexp_replace(host, ":[0-9]+$", "")
    rev = F.concat(
        F.array_join(F.reverse(F.split(hostname, r"\.")), ","),
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
    )
    rest = F.regexp_replace(u, r"^[A-Za-z]+://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def host_graph_delta(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Two crawl generations of the host web graph -> per-edge
    evolution: status in {'added', 'removed', 'persisted'} plus the
    weight delta — how the link structure moved between crawls (the
    graph-level sibling of frontier.capture_delta's URL-level diff;
    at archive scale this is the signal link-spam monitoring and
    freshness models consume).

    Plan: ONE full outer join on the (src_host, dst_host) key pair —
    both generations shuffle on the same keys and co-partition; with
    bucketed edge tables the exchange disappears — and a codegen
    CASE.  Missing weights count as 0 for the delta (an added edge's
    delta IS its weight)."""
    o = old_edges.select(
        "src_host", "dst_host", F.col("weight").alias("old_weight")
    )
    n = new_edges.select(
        "src_host", "dst_host", F.col("weight").alias("new_weight")
    )
    j = o.join(n, ["src_host", "dst_host"], "full_outer")
    status = (
        F.when(F.col("old_weight").isNull(), F.lit("added"))
        .when(F.col("new_weight").isNull(), F.lit("removed"))
        .otherwise(F.lit("persisted"))
    )
    return j.select(
        "src_host",
        "dst_host",
        status.alias("status"),
        "old_weight",
        "new_weight",
        (
            F.coalesce("new_weight", F.lit(0))
            - F.coalesce("old_weight", F.lit(0))
        ).alias("weight_delta"),
    )
