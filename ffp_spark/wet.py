"""WET-style plain-text extraction: HTML pages -> text records.

The third leg of the public crawl-archive triple (WARC = raw capture,
WAT = metadata, WET = extracted text): strip markup, drop
script/style/template payloads, keep block structure as line breaks.
The WET record is what every downstream text pipeline in this repo
(quality filters, dedup shingles, tokenizers, language ID) actually
consumes — this operator is the bridge from the ingestion tier to the
curation tier.

Contract (deterministic, pinned by the oracle + unit tests):

* ``script`` / ``style`` / ``noscript`` / ``template`` subtrees
  contribute NOTHING (their text is code, not content);
* block-level elements (``p``, ``div``, ``h1``-``h6``, ``li``,
  ``br``, ``title``, table rows, ...) break lines; inline elements
  (``span``, ``a``, ``b``, ...) do not;
* within a line, whitespace collapses to single spaces and is
  trimmed; empty lines are dropped; lines join with ``\\n``;
* unparseable HTML yields NULL text (parse errors are already error
  ROWS in the parse stage; WET extraction is a secondary consumer).

Spark shape: ONE mapInArrow hop over (url, html) through the existing
HTML-soup bridge (the S3 parser); only (url, text, n_words, n_chars)
leave the task — the payload never crosses into pandas object arrays.
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

_SKIP_TAGS = {"script", "style", "noscript", "template"}
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "tbody", "td",
    "tfoot", "th", "thead", "title", "tr", "ul",
}
_LINE_WS = re.compile(r"[ \t\r\f\v]+")

WET_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("text", StringType(), True),
        StructField("n_words", IntegerType(), True),
        StructField("n_chars", IntegerType(), True),
    ]
)


def _walk(root, out: list) -> None:
    # explicit stack, not recursion: adversarial pages nest thousands
    # of elements deep, and a RecursionError inside mapInArrow would
    # fail the Spark task instead of yielding a text row
    stack = [(root, 0)]
    while stack:
        el, phase = stack.pop()
        tag = el.tag if isinstance(el.tag, str) else ""
        if phase == 0:
            if tag in _SKIP_TAGS:
                if el.tail:
                    out.append(el.tail)
                continue
            if tag in _BLOCK_TAGS:
                out.append("\n")
            if el.text:
                out.append(el.text)
            stack.append((el, 1))
            for child in reversed(list(el)):
                stack.append((child, 0))
        else:
            if tag in _BLOCK_TAGS:
                out.append("\n")
            if el.tail:
                out.append(el.tail)


def page_text(payload: bytes) -> Optional[str]:
    """One HTML payload -> WET text (None when the HTML will not
    parse).  Pure function (tests + the vectorized stage)."""
    from .feedparse.htmlsoup import parse_html_tree

    tree = parse_html_tree(payload)
    if tree is None:
        return None
    parts: list = []
    _walk(tree, parts)
    lines = []
    for raw_line in "".join(parts).split("\n"):
        line = _LINE_WS.sub(" ", raw_line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def wet_records(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """PAGES -> WET_SCHEMA records via mapInArrow (binary payloads
    stay in Arrow buffers).  ``n_words`` counts whitespace-separated
    tokens, ``n_chars`` counts characters of the final text — the two
    numbers every corpus data card and length-filter tier keys on."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    src = pages.select(
        F.col(url_col).alias("url"), F.col(html_col).cast("binary").alias("html")
    )

    def run(batches: Iterable["pa.RecordBatch"]):
        out_schema = to_arrow_schema(WET_SCHEMA)
        for batch in batches:
            rows = []
            for rec in batch.to_pylist():
                payload = bytes(rec["html"]) if rec["html"] is not None else b""
                text = page_text(payload)
                rows.append(
                    {
                        "url": rec["url"],
                        "text": text,
                        "n_words": len(text.split()) if text is not None else None,
                        "n_chars": len(text) if text is not None else None,
                    }
                )
            yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return src.mapInArrow(run, schema=WET_SCHEMA)
