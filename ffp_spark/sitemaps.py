"""Sitemap source: parse sitemap.xml / sitemapindex into a URL
frontier table (round-6 'What's missing' item 4).

The reference explicitly REJECTS ``urlset``/``sitemapindex`` roots as
non-feeds (reference main.py:615-617 `_NON_FEED_MESSAGES`); a crawl
pipeline instead consumes them as its URL-discovery source beside
robots.txt.  This module upgrades those roots to a first-class source
while reusing the exact feedparse machinery the parser already ships:
byte preparation + the strict->recover parse ladder (S4-S9,
prep.prepare_feed_bytes / xmlio.load_feed_xml), the F1 date cascade
for ``<lastmod>`` (dates.to_iso_utc — sitemaps allow both W3C dates
and full timestamps), the F13 try-cast discipline for ``<priority>``,
and urljoin resilience for relative ``<loc>`` values (the spec demands
absolute URLs; real sitemaps violate that constantly).

Scale shape: parsing is one mapInArrow hop over (url, body) — sitemap
files are independent, so file-level parallelism is exact, like the
WARC reader.  Index recursion is NOT a driver loop: one level of
``sitemapindex`` resolves through a broadcastable semi-join of child
``loc`` values against the sitemap table itself (the S3c meta-refresh
resolution pattern, pipeline.py:94-194) — sitemap tables are tiny next
to the page corpus (one row per sitemap FILE), so the join never
shuffles the frontier.  Error discipline: unparseable XML and
non-sitemap roots become ``kind='error'`` rows, never task failures.
"""

from __future__ import annotations

from typing import Iterable, Optional
from urllib.parse import urljoin

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SITEMAP_SCHEMA = StructType(
    [
        StructField("sitemap_url", StringType(), False),
        StructField("kind", StringType(), True),  # urlset | sitemapindex | error
        StructField("loc", StringType(), True),
        StructField("lastmod", StringType(), True),  # ISO-8601 UTC (F1 cascade)
        StructField("changefreq", StringType(), True),
        StructField("priority", DoubleType(), True),
        StructField("error", StringType(), True),
    ]
)

_CHILD_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_rows(url: str, data: bytes) -> list[dict]:
    """One sitemap document -> frontier rows (one per <url>/<sitemap>
    child).  Pure function, shared by the vectorized stage and tests."""
    from .feedparse.dates import to_iso_utc
    from .feedparse.prep import prepare_feed_bytes
    from .feedparse.xmlio import load_feed_xml

    def err(msg: str) -> list[dict]:
        return [
            {
                "sitemap_url": url,
                "kind": "error",
                "loc": None,
                "lastmod": None,
                "changefreq": None,
                "priority": None,
                "error": msg[:300],
            }
        ]

    try:
        doc = load_feed_xml(prepare_feed_bytes(data))
    except Exception as exc:  # parse ladder exhausted -> error ROW
        return err(f"sitemap XML parse failed: {exc}")
    kind = _local(doc.root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return err(f"not a sitemap (root <{kind}>)")
    rows: list[dict] = []
    for child in doc.root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        vals: dict[str, str] = {}
        for c in child:
            name = _local(c.tag)
            if name in _CHILD_FIELDS and c.text and c.text.strip():
                vals.setdefault(name, c.text.strip())
        loc = vals.get("loc")
        try:  # F13 try-cast: junk priority is NULL, never a failure
            priority: Optional[float] = float(vals["priority"])
        except (KeyError, ValueError):
            priority = None
        rows.append(
            {
                "sitemap_url": url,
                "kind": kind,
                "loc": urljoin(url, loc) if loc else None,
                "lastmod": to_iso_utc(vals.get("lastmod")),
                "changefreq": vals.get("changefreq", "").lower() or None,
                "priority": priority,
                "error": None,
            }
        )
    return rows


def parse_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(url, body) sitemap documents -> SITEMAP_SCHEMA frontier rows.
    mapInArrow (bodies are bytes; binary stages never go through
    pandas object arrays — README perf notes)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    src = sitemaps.select(
        F.col(url_col).alias("url"), F.col(body_col).cast("binary").alias("body")
    )

    def run(batches: Iterable["pa.RecordBatch"]):
        out_schema = to_arrow_schema(SITEMAP_SCHEMA)
        for batch in batches:
            rows: list[dict] = []
            for rec in batch.to_pylist():
                body = bytes(rec["body"]) if rec["body"] is not None else b""
                rows.extend(parse_sitemap_rows(rec["url"], body))
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return src.mapInArrow(run, schema=SITEMAP_SCHEMA)


def sitemap_frontier(parsed: DataFrame) -> DataFrame:
    """Frontier URLs with one level of index lineage resolved: every
    ``urlset`` entry, annotated with ``via_index`` = the sitemapindex
    that referenced its sitemap (NULL for root sitemaps).

    Plan shape: index edges (sitemapindex rows: parent -> child loc)
    are one row per sitemap FILE — broadcastable at any realistic
    crawl size — left-joined onto the urlset rows by sitemap_url; the
    frontier itself never reshuffles (same reasoning as the S3c
    redirect semi-join).  Deeper nesting is against the sitemap spec
    (indexes must not reference indexes) and stays unresolved by
    design."""
    entries = parsed.where(F.col("kind") == "urlset")
    index_edges = (
        parsed.where((F.col("kind") == "sitemapindex") & F.col("loc").isNotNull())
        .select(
            F.col("loc").alias("sitemap_url"),
            F.col("sitemap_url").alias("via_index"),
        )
        .dropDuplicates(["sitemap_url"])  # one parent per child (spec)
    )
    return entries.join(F.broadcast(index_edges), "sitemap_url", "left").select(
        "sitemap_url",
        "loc",
        "lastmod",
        "changefreq",
        "priority",
        "via_index",
    )


def sitemap_urls_from_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) robots.txt documents -> (host, ln, sitemap_url)
    rows from ``Sitemap:`` directives: the discovery handshake that
    closes the loop robots -> sitemaps -> frontier (a crawler learns
    WHERE the sitemaps are from robots.txt; sitemaps.org specifies
    the directive, RFC 9309 carries it as an extension line).

    Contract: key match is case-insensitive and whitespace-trimmed
    (same normalization as robots.parse_robots); the value is
    everything after the FIRST colon (sitemap URLs contain ``://``),
    trimmed; comments strip first, so a Sitemap mention inside a
    comment never emits; directives are GLOBAL per the spec — group
    position is irrelevant, so no UA-window state is needed and the
    whole extraction is codegen string expressions over a line
    explode (map-side, no shuffle at all)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    return (
        lines.where(
            F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
            == "sitemap"
        )
        .select(
            "host",
            "ln",
            F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias(
                "sitemap_url"
            ),
        )
        .where(F.col("sitemap_url") != "")
    )
