"""Byte-level feed preparation (reference operators S4-S8).

Turns raw fetched payload bytes (or str) into XML bytes ready for the
parser: junk-prefix trimming, encoding sniffing, and a set of targeted
regex repairs for malformations seen in the wild.  Behavior mirrors
reference ``main.py:145-289`` (verified against its golden fixtures);
the code is an independent implementation.
"""

from __future__ import annotations

import re


class NotAFeedError(ValueError):
    """Payload is recognizably something other than a feed (HTML, etc.)."""


_DECL_ENC_STR = re.compile(
    r"(<\?xml[^>]*encoding=[\"'])([^\"']+)([\"'][^>]*\?>)", re.IGNORECASE
)
_DECL_ENC_BYTES = re.compile(
    rb"(<\?xml[^>]*encoding=[\"'])([^\"']+)([\"'][^>]*\?>)", re.IGNORECASE
)
_DUP_DECL = re.compile(rb"<\?xml\?xml\s+", re.IGNORECASE)
_DUP_CLOSE = re.compile(rb"\?\?>\s*")
_BARE_ATTR = re.compile(rb'(\s+[\w:]+)=([^\s>"\']+)')
_DECL_UTF16 = re.compile(
    rb'(<\?xml[^>]*encoding=["\'])utf-16(-le|-be)?(["\'][^>]*\?>)', re.IGNORECASE
)
_OPEN_LINK = re.compile(rb"<link([^>]*[^/])>\s*(?=\n\s*<(?!/link\s*>))", re.MULTILINE)

_XML_START_MARKS = (b"<?xml", b"<rss", b"<feed", b"<rdf:rdf", b"<?xml-stylesheet")


def sniff_encoding(data: bytes) -> str:
    """BOM first, then the XML declaration in the first 2 KB, else utf-8."""
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    m = _DECL_ENC_BYTES.search(data[:2000])
    if m:
        try:
            return m.group(2).decode("ascii", errors="replace").lower()
        except Exception:
            return "utf-8"
    return "utf-8"


def trim_to_xml(data: bytes) -> bytes:
    """Slice off junk before the XML document; reject obvious HTML."""
    stripped = data.lstrip()
    head = stripped[:2000].lower()
    if head.startswith(b"\xef\xbb\xbf"):
        head = head[3:]
        stripped = stripped[3:]

    if head.startswith((b"<?xml", b"<rss", b"<feed", b"<rdf")):
        return stripped
    if head.startswith(b"<!doctype html") or head.startswith(b"<html"):
        raise NotAFeedError("Content appears to be HTML, not a valid RSS/Atom feed")

    window = data[: min(len(data), 8192)].lower()
    best = -1
    for mark in _XML_START_MARKS:
        at = window.find(mark)
        if at != -1 and (best == -1 or at < best):
            best = at
    if best != -1:
        return data[best:]

    if b"<script>" in head or b"<body>" in head:
        raise NotAFeedError("Content appears to be HTML, not a valid RSS/Atom feed")
    return data


def repair_bytes(data: bytes, actual_encoding: str = "utf-8") -> bytes:
    """Targeted fixes: doubled declarations, mislabeled utf-16, bare
    attribute values, unclosed ``<link>`` tags.  Header-only patterns run
    on the first 2 KB (they can only match there)."""
    head, body = data[:2048], data[2048:]
    head = _DUP_DECL.sub(b"<?xml ", head)
    head = _DUP_CLOSE.sub(b"?>", head)
    if actual_encoding.lower() != "utf-16":
        head = _DECL_UTF16.sub(
            rb"\1" + actual_encoding.encode("ascii", errors="replace") + rb"\3", head
        )
    data = head + body
    data = _BARE_ATTR.sub(rb'\1="\2"', data)
    data = _OPEN_LINK.sub(rb"<link\1/>", data)
    return data


def prepare_feed_bytes(payload: str | bytes) -> bytes:
    """Full S4-S8 pipeline: returns parser-ready bytes or raises ValueError."""
    if isinstance(payload, str):
        if payload.lstrip().startswith("<?xml"):
            payload = _DECL_ENC_STR.sub(r"\1utf-8\3", payload, count=1)
        return prepare_feed_bytes(payload.encode("utf-8", errors="replace"))

    data = trim_to_xml(payload)
    if not data:
        raise ValueError("Empty content")

    # U+2028/U+2029 are invalid in XML 1.0; probe cheaply before a full scan
    probe = data[:65536]
    if b"\xe2\x80\xa8" in probe or b"\xe2\x80\xa9" in probe:
        data = data.replace(b"\xe2\x80\xa8", b"\n").replace(b"\xe2\x80\xa9", b"\n")

    declared = sniff_encoding(data)
    actual = declared
    if declared.startswith("utf-16") and b"\x00" not in data[:200]:
        actual = "utf-8"  # declaration lies: bytes are single-byte

    head200 = data[:200]
    wants_repair = (
        b"?xml?xml" in head200.lower()
        or b"??>" in head200
        or (
            b"rss:" in data[:500].lower()
            and b"xmlns:rss" not in data[:1000].lower()
        )
        or (b"utf-16" in head200.lower() and actual != "utf-16")
    )
    if wants_repair:
        data = repair_bytes(data, actual_encoding=actual)
    return data
