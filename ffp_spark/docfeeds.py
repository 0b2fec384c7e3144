"""Bridge the driver's relational `documents` table into PAGES rows.

Each document becomes a one-entry RSS feed, deterministically (pure
function of doc_id) — which gives the KG pipeline a DuckDB-checkable
oracle: every successfully parsed doc-feed emits exactly one triple per
predicate, so triple counts per predicate must equal count(documents).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable, Iterator
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

from .schemas import PAGES_SCHEMA

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
_AUTHORS = ("Ada Author", "Ben Writer", "Cara Blogger", "Dan Poster", "Eve Editor")


def doc_to_feed_xml(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """One-entry RSS, a pure function of doc_id.

    Besides title/guid/pubDate/creator, each item deterministically
    carries link-rel variants (P9), tags (P14), enclosures (P13) and
    media (P12) derived from doc_id arithmetic — so the per-operator
    driver queries have exact DuckDB oracles:

    * doc_id % 3 == 0: atom:link alternate+self+related (self dropped,
      alternate wins); % 3 == 1: one rel=enclosure link; else none.
    * every item: <category domain>cat-{id%7}; even ids also emit
      <dc:subject>subj-{id%3}.
    * doc_id % 5 == 0: one enclosure, length = doc_id * 100.
    * doc_id % 4 == 0: one media:content (image/jpeg, width =
      100 + id % 50) — and ONLY those payloads contain the media
      namespace bytes, so the has_media_ns pushdown skip is exercised
      both ways.
    """
    # one hour per doc_id: spreads published dates across days so the
    # date-normalization cross-check query has a real histogram
    d = int(doc_id)
    published = (_EPOCH + _dt.timedelta(hours=d)).strftime("%Y-%m-%dT%H:%M:%SZ")
    author = _AUTHORS[d % len(_AUTHORS)]
    body = escape(text or "")
    base = f"https://docs.example/{source}"

    if d % 3 == 0:
        links = (
            f'<atom:link rel="alternate" type="text/html" href="{base}/{d}/alt"/>\n'
            f'<atom:link rel="self" href="{base}/feed-{d}.xml"/>\n'
            f'<atom:link rel="related" href="{base}/{d}/rel"/>'
        )
    elif d % 3 == 1:
        links = f'<atom:link rel="enclosure" type="audio/mpeg" href="{base}/{d}.mp3"/>'
    else:
        links = ""
    tags = f'<category domain="https://cats.example/{d % 7}">cat-{d % 7}</category>'
    if d % 2 == 0:
        tags += f"\n<dc:subject>subj-{d % 3}</dc:subject>"
    enclosure = (
        f'<enclosure url="https://docs.example/media/{d}.mp3" '
        f'length="{d * 100}" type="audio/mpeg"/>'
        if d % 5 == 0
        else ""
    )
    media_ns = ""
    media = ""
    if d % 4 == 0:
        media_ns = ' xmlns:media="http://search.yahoo.com/mrss/"'
        media = (
            f'<media:content url="https://img.example/{d}.jpg" type="image/jpeg" '
            f'medium="image" width="{100 + d % 50}" height="80">'
            f"<media:title>m{d}</media:title></media:content>"
        )

    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0" xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:atom="http://www.w3.org/2005/Atom"{media_ns}>
<channel>
<title>{escape(source or 'src')} docs</title>
<link>https://docs.example/{source}/</link>
<description>doc feed {doc_id}</description>
<item>
<title>Document {doc_id}</title>
<link>{base}/{d}</link>
<guid isPermaLink="false">urn:doc:{doc_id}</guid>
<pubDate>{published}</pubDate>
<dc:creator>{author}</dc:creator>
{links}
{tags}
{enclosure}
{media}
<description>{body}</description>
</item>
</channel></rss>"""
    return xml.encode("utf-8")


def documents_as_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) -> PAGES.

    mapInArrow, not mapInPandas: the html column is binary, and binary
    through pandas object arrays is the measured 15x-at-32-cores cliff
    (see README perf notes / udfs.parse_page_rows)."""

    def gen(batches: Iterable["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(PAGES_SCHEMA)
        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            langs = batch.column("lang").to_pylist()
            sources = batch.column("source").to_pylist()
            rows = [
                {
                    "url": f"https://docs.example/{source}/feed-{doc_id}.xml",
                    "warc_ts": _EPOCH + _dt.timedelta(seconds=int(doc_id)),
                    "html": doc_to_feed_xml(doc_id, text, lang, source),
                    "text": text,
                    "lang": lang,
                }
                for doc_id, text, lang, source in zip(ids, texts, langs, sources)
            ]
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return documents.select("doc_id", "text", "lang", "source").mapInArrow(
        gen, schema=PAGES_SCHEMA
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # guide §2.5 (input skew): a small documents table arrives as ONE
    # parquet split, which would serialize the downstream Python
    # doc->feed->parse chain onto a single task regardless of cluster
    # width.  Spread to cluster parallelism when (and only when) the
    # scan has fewer splits — at production scale the table has more
    # splits than cores and this is a no-op.  Round-robin repartition
    # with Spark's default sort-before-repartition keeps the row-to-
    # partition map deterministic under retries; all consumers
    # aggregate, so results are partitioning-independent anyway.
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        df = df.repartition(p)
    return df
