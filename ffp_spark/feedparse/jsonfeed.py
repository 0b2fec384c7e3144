"""JSON Feed (jsonfeed.org 1.0/1.1) -> normalized feed dict.

Independent implementation of reference ``main.py:292-517``: sniff the
``{`` prefix, accept documents whose ``version`` mentions jsonfeed.org or
that carry an ``items`` list, then map fields (content_html preferred
over content_text, attachments -> enclosures, singular/plural author).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from .dates import to_iso_utc

try:
    import orjson

    _loads = orjson.loads
except ImportError:  # pragma: no cover
    _loads = json.loads


def try_parse_json_feed(
    payload: str | bytes,
    include_content: bool = True,
    include_tags: bool = True,
    include_enclosures: bool = True,
) -> Optional[dict[str, Any]]:
    probe = payload.lstrip()
    if isinstance(probe, bytes):
        if not probe.startswith(b"{"):
            return None
    elif not probe.startswith("{"):
        return None
    try:
        data = _loads(payload)
    except Exception:
        return None
    if not isinstance(data, dict):
        return None
    version = data.get("version")
    if (isinstance(version, str) and "jsonfeed.org" in version) or isinstance(
        data.get("items"), list
    ):
        return _map_json_feed(
            data,
            include_content=include_content,
            include_tags=include_tags,
            include_enclosures=include_enclosures,
        )
    return None


def _map_json_feed(
    data: dict[str, Any],
    include_content: bool,
    include_tags: bool,
    include_enclosures: bool,
) -> dict[str, Any]:
    info: dict[str, Any] = {
        "title": data.get("title", ""),
        "link": data.get("home_page_url", ""),
        "subtitle": data.get("description", ""),
        "id": data.get("feed_url", ""),
        "language": data.get("language"),
    }
    if data.get("icon"):
        info["icon"] = data["icon"]
    if data.get("favicon"):
        info["favicon"] = data["favicon"]
    feed_authors = data.get("authors")
    if feed_authors:
        info["author"] = feed_authors[0].get("name", "")

    info["links"] = []
    if data.get("home_page_url"):
        info["links"].append(
            {"rel": "alternate", "type": "text/html", "href": data["home_page_url"]}
        )
    if data.get("feed_url"):
        info["links"].append(
            {"rel": "self", "type": "application/json", "href": data["feed_url"]}
        )

    entries: list[dict[str, Any]] = []
    for item in data.get("items", []):
        entry: dict[str, Any] = {
            "id": item.get("id", item.get("url", "")),
            "title": item.get("title", ""),
            "link": item.get("url", ""),
        }

        content_html = item.get("content_html")
        content_text = item.get("content_text")
        summary = item.get("summary", "")
        if content_html:
            if include_content:
                entry["content"] = [{"type": "text/html", "value": content_html}]
            entry["description"] = summary
        elif content_text:
            if include_content:
                entry["content"] = [{"type": "text/plain", "value": content_text}]
            entry["description"] = summary or content_text[:512]
        else:
            entry["description"] = summary

        if item.get("date_published"):
            entry["published"] = to_iso_utc(item["date_published"])
        if item.get("date_modified"):
            entry["updated"] = to_iso_utc(item["date_modified"])

        if item.get("image"):
            entry["image"] = item["image"]
        if item.get("banner_image"):
            entry["banner_image"] = item["banner_image"]

        authors = item.get("authors")
        if authors:
            entry["author"] = authors[0].get("name", "")
        else:
            single = item.get("author")
            if single:
                entry["author"] = single.get("name", "")

        tags = item.get("tags")
        if include_tags and tags:
            entry["tags"] = [{"term": t, "scheme": None, "label": None} for t in tags]

        attachments = item.get("attachments")
        if include_enclosures and attachments:
            enclosures = []
            for att in attachments:
                url = att.get("url", "")
                if url:
                    enc: dict[str, Any] = {"url": url, "type": att.get("mime_type", "")}
                    if att.get("size_in_bytes"):
                        enc["length"] = att["size_in_bytes"]
                    enclosures.append(enc)
            if enclosures:
                entry["enclosures"] = enclosures

        author = entry.get("author")
        if author:
            detail = {"name": author}
            entry["author_detail"] = detail
            entry["authors"] = [detail]

        entry["links"] = []
        if item.get("url"):
            entry["links"].append(
                {"rel": "alternate", "type": "text/html", "href": item["url"]}
            )
        if item.get("external_url"):
            entry["links"].append(
                {"rel": "related", "type": "text/html", "href": item["external_url"]}
            )

        entries.append(entry)

    return {"feed": info, "entries": entries}
