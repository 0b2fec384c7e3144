"""Minimal HTML-soup -> ElementTree bridge.

Stands in for ``lxml.etree.HTMLParser`` (reference ``main.py:593, 644,
730-741``): meta-refresh extraction, server-error text recovery, and the
items-lost-to-XML-view rescue for RSS-inside-HTML.  Uses the stdlib
``html.parser`` with implied-end-tag handling for void elements.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from html.parser import HTMLParser
from typing import Optional
from urllib.parse import urljoin

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _SoupBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root: Optional[ET.Element] = None
        self._stack: list[ET.Element] = []

    def _push(self, tag: str, attrs) -> ET.Element:
        elem = ET.Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        if self._stack:
            self._stack[-1].append(elem)
        elif self.root is None:
            self.root = elem
        else:  # multiple top-level nodes: wrap under a synthetic html root
            wrapper = ET.Element("html")
            wrapper.append(self.root)
            wrapper.append(elem)
            self.root = wrapper
        return elem

    def handle_starttag(self, tag: str, attrs) -> None:
        elem = self._push(tag, attrs)
        if tag not in _VOID:
            self._stack.append(elem)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._push(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if not self._stack:
            return
        cur = self._stack[-1]
        kids = list(cur)
        if kids:
            kids[-1].tail = (kids[-1].tail or "") + data
        else:
            cur.text = (cur.text or "") + data


def parse_html_tree(payload: str | bytes) -> Optional[ET.Element]:
    if isinstance(payload, bytes):
        text = payload.decode("utf-8", errors="replace")
    else:
        text = payload
    builder = _SoupBuilder()
    try:
        builder.feed(text)
        builder.close()
    except Exception:
        return None
    return builder.root


_RE_REFRESH_URL = re.compile(r'url\s*=\s*["\']?\s*([^"\'>\s]+)', re.IGNORECASE)


def meta_refresh_url(payload: str | bytes, base_url: str) -> Optional[str]:
    """Redirect target from <meta http-equiv=refresh>, absolutized against
    base_url; None when absent or self-referential (main.py:637-657)."""
    tree = parse_html_tree(payload)
    if tree is None:
        return None
    for meta in tree.iter("meta"):
        if (meta.get("http-equiv") or "").lower() == "refresh":
            m = _RE_REFRESH_URL.search(meta.get("content", ""))
            if m:
                target = urljoin(base_url, m.group(1))
                if target != base_url:
                    return target
    return None
