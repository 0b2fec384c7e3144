"""Vectorized parse stage (operator K1, SURVEY.md §2.B).

``parse_pages`` maps the PAGES table through the pure-Python parser via
``mapInPandas`` — Arrow-batched, one Python worker per core, no per-row
Python UDFs (north-rule API requirement).  Catalyst sees a typed
PARSED_SCHEMA output, so nested-schema pruning applies downstream.

Reference parity: the parse itself is ffp_spark.feedparse (golden-tested
against /root/reference/tests/integration); this module only adapts
dicts to the frozen StructTypes.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame

from .schemas import PARSED_SCHEMA

_FEED_SCALARS = (
    "title", "link", "subtitle", "generator", "publisher", "author",
    "id", "language", "updated", "comments", "icon", "favicon",
)
_ENTRY_SCALARS = (
    "id", "title", "description", "link", "published", "updated",
    "author", "comments", "image", "banner_image",
)
_LINK_KEYS = ("rel", "type", "href", "title")
_TAG_KEYS = ("term", "scheme", "label")
_DETAIL_KEYS = ("type", "language", "base", "value")
_MEDIA_KEYS = (
    "url", "type", "medium", "width", "height", "title", "text",
    "description", "credit", "credit_scheme", "thumbnail_url",
)


def _keyed(rec: Optional[dict], keys: tuple[str, ...]) -> Optional[dict]:
    if rec is None:
        return None
    return {k: rec.get(k) for k in keys}


def _keyed_list(items: Optional[list], keys: tuple[str, ...]) -> Optional[list]:
    if items is None:
        return None
    return [_keyed(it, keys) for it in items]


def _shape_feed(feed: dict[str, Any]) -> dict[str, Any]:
    out: dict[str, Any] = {k: feed.get(k) for k in _FEED_SCALARS}
    out["title_detail"] = _keyed(feed.get("title_detail"), _DETAIL_KEYS)
    out["subtitle_detail"] = _keyed(feed.get("subtitle_detail"), _DETAIL_KEYS)
    out["generator_detail"] = _keyed(feed.get("generator_detail"), ("name", "version", "href"))
    out["links"] = _keyed_list(feed.get("links"), _LINK_KEYS)
    out["tags"] = _keyed_list(feed.get("tags"), _TAG_KEYS)
    return out


def _shape_entry(entry: dict[str, Any]) -> dict[str, Any]:
    out: dict[str, Any] = {k: entry.get(k) for k in _ENTRY_SCALARS}
    out["author_detail"] = _keyed(entry.get("author_detail"), ("name",))
    out["links"] = _keyed_list(entry.get("links"), _LINK_KEYS)
    out["tags"] = _keyed_list(entry.get("tags"), _TAG_KEYS)
    out["content"] = _keyed_list(entry.get("content"), _DETAIL_KEYS)
    enclosures = entry.get("enclosures")
    if enclosures is not None:
        shaped = []
        for enc in enclosures:
            length = enc.get("length")
            shaped.append(
                {
                    "url": enc.get("url"),
                    "type": enc.get("type"),
                    "length": length if isinstance(length, int) else None,
                }
            )
        out["enclosures"] = shaped
    else:
        out["enclosures"] = None
    out["media_content"] = _keyed_list(entry.get("media_content"), _MEDIA_KEYS)
    return out


def _classify_error(exc: Exception) -> str:
    msg = str(exc)
    if "HTML" in msg:
        return "html_page"
    if "Empty content" in msg or "empty content" in msg:
        return "empty"
    if "OPML" in msg or "sitemap" in msg:
        return "not_feed"
    if "status message" in msg or "returned error" in msg:
        return "server_error"
    if "Unknown feed type" in msg or "Unknown Atom namespace" in msg:
        return "unknown_type"
    if "missing channel" in msg:
        return "bad_structure"
    if "parse XML" in msg or "parsed as XML" in msg:
        return "xml_error"
    return "other"


_ZLIB_SECOND = (0x01, 0x5E, 0x9C, 0xDA)


def _maybe_decompress(payload: bytes, enc: Optional[str]) -> bytes:
    """Stored-payload decompression, mirroring the reference's
    Content-Encoding handling (main.py:443-475) for at-rest pages.

    An explicit ``content_encoding`` column value wins; otherwise magic
    bytes are sniffed (gzip 1f 8b; zlib 78 xx with a valid header
    checksum — the FCHECK field makes the two-byte header a multiple of
    31, so text false-positives are excluded).  Raises ValueError on
    a declared encoding that fails to decompress (callers turn that
    into an error ROW, never a task failure)."""
    import gzip
    import zlib

    enc = (enc or "").lower()
    if enc in ("gzip", "x-gzip") or (not enc and payload[:2] == b"\x1f\x8b"):
        try:
            return gzip.decompress(payload)
        except Exception as exc:
            raise ValueError(f"failed to decompress gzip payload: {exc}") from exc
    if enc == "deflate":
        try:
            return zlib.decompress(payload)
        except zlib.error:
            try:
                return zlib.decompress(payload, -zlib.MAX_WBITS)
            except Exception as exc:
                raise ValueError(f"failed to decompress deflate payload: {exc}") from exc
    if enc == "br":
        try:
            import brotli  # not shipped in this sandbox; gate behind import
        except ImportError as exc:
            raise ValueError(
                "Received brotli-compressed response but 'brotli' is not installed"
            ) from exc
        try:
            return brotli.decompress(payload)
        except Exception as exc:
            raise ValueError(f"failed to decompress brotli payload: {exc}") from exc
    if (
        not enc
        and len(payload) >= 2
        and payload[0] == 0x78
        and payload[1] in _ZLIB_SECOND
        and (payload[0] * 256 + payload[1]) % 31 == 0
    ):
        try:
            return zlib.decompress(payload)
        except zlib.error:
            return payload  # sniff was wrong; parse the raw bytes
    return payload




def parse_page_rows(
    batches: Iterable["pa.RecordBatch"],
    include_content: bool = True,
    include_tags: bool = True,
    include_media: bool = True,
    include_enclosures: bool = True,
) -> Iterator["pa.RecordBatch"]:
    """mapInArrow worker: PAGES record batches -> PARSED record batches.

    mapInArrow, not mapInPandas: converting large binary columns into
    pandas object arrays serializes badly under concurrency (measured
    ~15x slower at 32 cores); pyarrow list/struct building stays in C.
    """
    import pyarrow as pa

    from .feedparse import parse_feed  # import on executor

    out_schema = _arrow_parsed_schema()
    for batch in batches:
        names = set(batch.schema.names)
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        tss = batch.column("warc_ts").to_pylist() if "warc_ts" in names else [None] * len(urls)
        langs = batch.column("lang").to_pylist() if "lang" in names else [None] * len(urls)
        encs = (
            batch.column("content_encoding").to_pylist()
            if "content_encoding" in names
            else [None] * len(urls)
        )
        rows: list[dict[str, Any]] = []
        for url, payload, ts, lang, enc in zip(urls, htmls, tss, langs, encs):
            rec: dict[str, Any] = {
                "url": url,
                "warc_ts": ts,
                "lang": lang,
                "feed_type": None,
                "feed": None,
                "entries": None,
                "error": None,
                "error_class": None,
            }
            if payload is None:
                rec["error"], rec["error_class"] = "null payload", "empty"
                rows.append(rec)
                continue
            try:
                try:
                    payload = _maybe_decompress(payload, enc)
                except ValueError as exc:
                    rec["error"] = str(exc)[:500]
                    rec["error_class"] = "decompress_error"
                    rows.append(rec)
                    continue
                parsed = parse_feed(
                    payload,
                    include_content=include_content,
                    include_tags=include_tags,
                    include_media=include_media,
                    include_enclosures=include_enclosures,
                    with_feed_type=True,
                )
                rec["feed"] = _shape_feed(parsed["feed"])
                rec["entries"] = [_shape_entry(e) for e in parsed["entries"]]
                # the structure detector's verdict, not a byte re-sniff
                # (an RSS body mentioning "<feed" must not label as atom)
                rec["feed_type"] = parsed["feed_type"]
            except Exception as exc:  # error row, never a task failure
                rec["error"] = str(exc)[:500]
                rec["error_class"] = _classify_error(exc)
                # offline analogue of the reference's meta-refresh retry
                # (main.py:877-893): record the redirect target so a later
                # self-join on url == redirect can resolve it (SURVEY S3)
                if rec["error_class"] == "html_page":
                    try:
                        from .feedparse import meta_refresh_url

                        target = meta_refresh_url(payload, url or "")
                        if target:
                            rec["error"] = f"meta_refresh:{target}"
                            rec["error_class"] = "meta_refresh"
                    except Exception:
                        pass
            rows.append(rec)
        yield pa.RecordBatch.from_pylist(rows, schema=out_schema)


def _arrow_parsed_schema():
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(PARSED_SCHEMA)


def parse_pages(
    pages: DataFrame,
    include_content: bool = True,
    include_tags: bool = True,
    include_media: bool = True,
    include_enclosures: bool = True,
) -> DataFrame:
    """PAGES -> PARSED.  Column-prunes the scan to what the parse needs
    (url/warc_ts/lang/html) before crossing into Python."""
    cols = [
        c
        for c in ("url", "warc_ts", "html", "lang", "content_encoding")
        if c in pages.columns
    ]

    def runner(batches):
        return parse_page_rows(
            batches,
            include_content=include_content,
            include_tags=include_tags,
            include_media=include_media,
            include_enclosures=include_enclosures,
        )

    return pages.select(*cols).mapInArrow(runner, schema=PARSED_SCHEMA)
