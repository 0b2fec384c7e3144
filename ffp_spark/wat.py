"""WAT-style page-metadata extraction: HTML pages -> metadata records.

Completes the public crawl-archive triple alongside sources.py (WARC,
the raw captures) and wet.py (WET, the extracted text): WAT is the
per-page METADATA record — title, meta description, outlink/resource
counts — that powers crawl analytics, seed selection and the web-graph
builds without ever touching payload bytes again.

Contract (pinned by the oracle + unit tests):

* ``title`` = first <title> text, whitespace-collapsed, NULL when
  absent/empty;
* ``meta_description`` = content of the first <meta name="description">
  (name matched case-insensitively), NULL when absent;
* ``n_links`` counts <a> elements with a non-empty href (the same
  elements weblinks.extract_links emits, BEFORE scheme filtering —
  WAT counts what the page declares, the link extractor decides what
  a crawler may follow);
* ``n_images`` / ``n_scripts`` count <img> / <script> elements;
* unparseable HTML -> all-NULL metadata (counts included — a page
  that did not parse has no declared structure, and NULL != 0).

Spark shape: ONE mapInArrow hop through the existing HTML-soup
bridge; only the metadata columns leave the task.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_WS = re.compile(r"\s+")

WAT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("title", StringType(), True),
        StructField("meta_description", StringType(), True),
        StructField("n_links", IntegerType(), True),
        StructField("n_images", IntegerType(), True),
        StructField("n_scripts", IntegerType(), True),
    ]
)


def page_metadata(payload: bytes) -> Optional[dict]:
    """One HTML payload -> WAT metadata dict (None when the HTML will
    not parse).  Pure function (tests + the vectorized stage)."""
    from .feedparse.htmlsoup import parse_html_tree

    tree = parse_html_tree(payload)
    if tree is None:
        return None
    title: Optional[str] = None
    desc: Optional[str] = None
    n_links = n_images = n_scripts = 0
    for el in tree.iter():
        tag = el.tag if isinstance(el.tag, str) else ""
        if tag == "title" and title is None:
            t = _WS.sub(" ", "".join(el.itertext())).strip()
            if t:
                title = t
        elif tag == "meta" and desc is None:
            if (el.get("name") or "").lower() == "description":
                desc = el.get("content")
        elif tag == "a":
            if (el.get("href") or "").strip():
                n_links += 1
        elif tag == "img":
            n_images += 1
        elif tag == "script":
            n_scripts += 1
    return {
        "title": title,
        "meta_description": desc,
        "n_links": n_links,
        "n_images": n_images,
        "n_scripts": n_scripts,
    }


def wat_records(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """PAGES -> WAT_SCHEMA metadata records via mapInArrow (payload
    bytes stay in Arrow buffers; only the small metadata columns come
    back)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    src = pages.select(
        F.col(url_col).alias("url"), F.col(html_col).cast("binary").alias("html")
    )

    def run(batches: Iterable["pa.RecordBatch"]):
        out_schema = to_arrow_schema(WAT_SCHEMA)
        for batch in batches:
            rows = []
            for rec in batch.to_pylist():
                payload = bytes(rec["html"]) if rec["html"] is not None else b""
                meta = page_metadata(payload)
                row = {"url": rec["url"]}
                if meta is None:
                    row.update(
                        title=None,
                        meta_description=None,
                        n_links=None,
                        n_images=None,
                        n_scripts=None,
                    )
                else:
                    row.update(meta)
                rows.append(row)
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return src.mapInArrow(run, schema=WAT_SCHEMA)
