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

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .schemas import PAGES_SCHEMA

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
_AUTHORS = ("Ada Author", "Ben Writer", "Cara Blogger", "Dan Poster", "Eve Editor")


def doc_to_feed_xml(doc_id: int, text: str, lang: str, source: str) -> bytes:
    # one hour per doc_id: spreads published dates across days so the
    # date-normalization cross-check query has a real histogram
    published = (_EPOCH + _dt.timedelta(hours=int(doc_id))).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    author = _AUTHORS[int(doc_id) % len(_AUTHORS)]
    body = escape(text or "")
    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0" xmlns:dc="http://purl.org/dc/elements/1.1/">
<channel>
<title>{escape(source or 'src')} docs</title>
<link>https://docs.example/{source}/</link>
<description>doc feed {doc_id}</description>
<item>
<title>Document {doc_id}</title>
<link>https://docs.example/{source}/{doc_id}</link>
<guid isPermaLink="false">urn:doc:{doc_id}</guid>
<pubDate>{published}</pubDate>
<dc:creator>{author}</dc:creator>
<description>{body}</description>
</item>
</channel></rss>"""
    return xml.encode("utf-8")


def documents_as_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) -> PAGES."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.append(
                    {
                        "url": f"https://docs.example/{r.source}/feed-{r.doc_id}.xml",
                        "warc_ts": _EPOCH + _dt.timedelta(seconds=int(r.doc_id)),
                        "html": doc_to_feed_xml(r.doc_id, r.text, r.lang, r.source),
                        "text": r.text,
                        "lang": r.lang,
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id", "text", "lang", "source").mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
