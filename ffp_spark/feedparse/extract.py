"""Feed-structure detection and field extraction (reference operators
S11-S12, P1-P20).

Reimplementation of the extraction semantics of
``/root/reference/src/fastfeedparser/main.py`` (MIT, Kagi Search),
verified against the reference's golden fixture suite.  Most of the
module (ElemView, detect_structure, links/content/media fill, the
generic RDF machinery) is restructured onto a different substrate
(stdlib ElementTree + a custom recovering parser).  The two entry fast
paths ``extract_entry_rss`` / ``extract_entry_atom`` are close ports of
the reference's control flow (main.py:1372-1689) — byte-identical
output requires the same first-wins branch ordering, so the loop shape
is semantics-forced.  Pure Python, no Spark imports; runs inside the
Arrow parse UDF.
"""

from __future__ import annotations

import html as _html
import re
import xml.etree.ElementTree as ET
from typing import Any, Optional

from .dates import to_iso_utc
from .xmlio import XmlDoc, serialize_subtree

ATOM_NS_10 = "http://www.w3.org/2005/Atom"
ATOM_NS_10S = "https://www.w3.org/2005/Atom"
ATOM_NS_03 = "http://purl.org/atom/ns#"
RSS1_NS = "http://purl.org/rss/1.0/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
DC_NS = "http://purl.org/dc/elements/1.1/"
DCTERMS_NS = "http://purl.org/dc/terms/"
MEDIA_NS = "http://search.yahoo.com/mrss/"
CONTENT_NS = "http://purl.org/rss/1.0/modules/content/"
TAXO_NS = "http://purl.org/rss/1.0/modules/taxonomy/"
MVCB_NS = "http://webns.net/mvcb/"
XML_NS = "http://www.w3.org/XML/1998/namespace"

XML_LANG = "{%s}lang" % XML_NS
XML_BASE = "{%s}base" % XML_NS
RDF_ABOUT = "{%s}about" % RDF_NS
RDF_RESOURCE = "{%s}resource" % RDF_NS
CONTENT_ENCODED = "{%s}encoded" % CONTENT_NS
DC_SUBJECT = "{%s}subject" % DC_NS
DC_CREATOR = "{%s}creator" % DC_NS
MEDIA_CONTENT = "{%s}content" % MEDIA_NS
MEDIA_THUMB = "{%s}thumbnail" % MEDIA_NS
MEDIA_TITLE = "{%s}title" % MEDIA_NS
MEDIA_TEXT = "{%s}text" % MEDIA_NS
MEDIA_DESC = "{%s}description" % MEDIA_NS
MEDIA_CREDIT = "{%s}credit" % MEDIA_NS

_UNDECLARED = "urn:x-undeclared-ns:"

_RE_STRIP_TAGS = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"\s+")

NON_FEED_ROOTS: dict[str, str] = {
    "html": "Received HTML page instead of feed",
    "div": "Received HTML fragment instead of feed",
    "body": "Received HTML fragment instead of feed",
    "br": "Received HTML fragment instead of feed",
    "status": "Feed server returned status message",
    "error": "Feed server returned error",
    "opml": "Received OPML document instead of feed (OPML is an outline format, not a feed)",
    "urlset": "Received XML sitemap instead of feed (sitemap is for search engines, not a feed)",
    "sitemapindex": "Received XML sitemap instead of feed (sitemap is for search engines, not a feed)",
}


def atom_tagset(atom_ns: str) -> dict[str, str]:
    """Clark-notation tag strings for one Atom namespace (0.3 aliases
    issued/modified; 1.0 uses published/updated)."""
    ns = "{%s}" % atom_ns
    old = atom_ns == ATOM_NS_03
    return {
        "ns": ns,
        "id": ns + "id",
        "title": ns + "title",
        "summary": ns + "summary",
        "link": ns + "link",
        "content": ns + "content",
        "author": ns + "author",
        "name": ns + "name",
        "author_name": ns + "author/" + ns + "name",
        "category": ns + "category",
        "published": ns + ("issued" if old else "published"),
        "updated": ns + ("modified" if old else "updated"),
        "pub_fallback": ns + ("published" if old else "issued"),
        "upd_fallback": ns + ("updated" if old else "modified"),
    }


_TAGSET_CACHE: dict[str, dict[str, str]] = {}


def _tags_for(atom_ns: str) -> dict[str, str]:
    t = _TAGSET_CACHE.get(atom_ns)
    if t is None:
        t = _TAGSET_CACHE[atom_ns] = atom_tagset(atom_ns)
    return t


def _lit_key(tag: str) -> str:
    """Lowercased lookup key, mapping dummy-bound undeclared prefixes back
    to their literal ``prefix:local`` spelling (what lxml-recover keeps)."""
    if tag.startswith("{" + _UNDECLARED):
        uri, local = tag[1:].split("}", 1)
        return (uri[len(_UNDECLARED):] + ":" + local).lower()
    return tag.lower()


def _local_of(tag: str) -> str:
    """Lowercased local name: Clark, literal-prefixed, or plain."""
    if "{" in tag:
        tag = tag.rsplit("}", 1)[1]
    elif ":" in tag:
        tag = tag.split(":", 1)[1]
    return tag.lower()


class ElemView:
    """Namespace-tolerant value lookup over one element.

    Builds the reference's per-element child index once
    (main.py:1993-2008): ``{lowercased literal tag: first child}``.
    """

    __slots__ = ("elem", "_index")

    def __init__(self, elem: ET.Element) -> None:
        self.elem = elem
        self._index: Optional[dict[str, ET.Element]] = None

    def index(self) -> dict[str, ET.Element]:
        idx = self._index
        if idx is None:
            idx = {}
            for child in self.elem:
                if isinstance(child.tag, str):
                    idx[_lit_key(child.tag)] = child
            self._index = idx
        return idx

    def find(self, path: str) -> Optional[ET.Element]:
        el = self.elem.find(path)
        if el is None and "/" not in path and "{" not in path:
            idx = self.index()
            low = path.lower()
            for prefix in ("rss:", "atom:", "dc:"):
                el = idx.get(prefix + low)
                if el is not None:
                    break
        return el

    def value(self, path: str, attr: Optional[str] = None) -> Optional[str]:
        el = self.find(path)
        if el is None:
            return None
        if attr is not None:
            raw = el.get(attr)
            return raw.strip() if raw else None
        raw = el.text
        return raw.strip() if raw else None


def cascade_value(
    view: ElemView,
    feed_type: str,
    rss_path: str,
    atom_path: str,
    rdf_path: str,
    is_attr: bool,
) -> Optional[str]:
    """Per-format fallback cascade (reference main.py:1877-1946)."""
    if feed_type == "rss":
        got = view.value(rss_path)
        if got:
            return got
        if rss_path != rss_path.lower():
            got = view.value(rss_path.lower())
            if got:
                return got
        if is_attr:
            got = view.value(atom_path, attr="href") or view.value(atom_path, attr="link")
            if got:
                return got
        else:
            got = view.value(atom_path) or view.value(rdf_path)
            if got:
                return got
        if "{" in atom_path:
            got = view.value(atom_path.split("}", 1)[1])
            if got:
                return got
        return None
    if feed_type == "atom":
        if is_attr:
            return view.value(atom_path, attr="href") or view.value(atom_path, attr="link")
        return view.value(atom_path)
    return view.value(rdf_path)  # rdf


# ---------------------------------------------------------------------------
# structure detection
# ---------------------------------------------------------------------------

def root_local(root: ET.Element) -> str:
    tag = root.tag
    return tag.split("}")[-1].lower() if "}" in tag else tag.lower()


def detect_structure(
    doc: XmlDoc, raw: bytes
) -> tuple[str, ET.Element, list[ET.Element], Optional[str]]:
    """(feed_type, channel, items, atom_ns) — reference main.py:660-769."""
    root = doc.root
    kind = root_local(root)

    if kind == "rss":
        channel = root.find("channel")
        if channel is None:
            for child in root:
                if not isinstance(child.tag, str):
                    continue
                t = child.tag
                k = _lit_key(t)
                if t.endswith("}channel") or t == "channel" or k == "rss:channel" or (
                    ":" in k and k.endswith(":channel")
                ):
                    channel = child
                    break
        if channel is None:
            atomish = {"entry", "title", "subtitle", "updated", "id", "author", "link"}
            if any(isinstance(c.tag, str) and c.tag in atomish for c in root):
                channel = root
            else:
                raise ValueError("Invalid RSS feed: missing channel element")
        elif len(channel) == 0 and any(
            isinstance(c.tag, str) and c.tag == "item" for c in root
        ):
            channel = root

        items = channel.findall("item")
        if not items:
            for child in channel:
                if not isinstance(child.tag, str):
                    continue
                t = child.tag
                k = _lit_key(t)
                if t.endswith("}item") or t == "item" or k == "rss:item" or (
                    ":" in k and k.endswith(":item")
                ):
                    items.append(child)
            if not items:
                items = channel.findall(".//item") or [
                    d for d in channel.iter() if isinstance(d.tag, str)
                    and d is not channel and _local_of(d.tag) == "item"
                ]
            if not items:
                items = channel.findall("entry")
                if not items:
                    for child in channel:
                        if isinstance(child.tag, str) and (
                            child.tag.endswith("}entry") or child.tag == "entry"
                        ):
                            items.append(child)

        if len(items) < 5 and len(raw) > 20000:
            rescued = _rescue_items_html_soup(raw, len(items))
            if rescued is not None:
                channel, items = rescued
        return "rss", channel, items, None

    if kind == "feed":
        if "}" not in root.tag:
            raise ValueError(f"Unknown Atom namespace in feed type: {root.tag}")
        atom_ns = root.tag[1:].split("}", 1)[0]
        if atom_ns not in {ATOM_NS_10, ATOM_NS_10S, ATOM_NS_03}:
            raise ValueError(f"Unknown Atom namespace in feed type: {root.tag}")
        items = root.findall(".//{%s}entry" % atom_ns)
        return "atom", root, items, atom_ns

    if root.tag == "{%s}RDF" % RDF_NS:
        items = root.findall(".//{%s}item" % RSS1_NS) or root.findall("item")
        return "rdf", root, items, None

    raise ValueError(f"Unknown feed type: {root.tag}")


def _rescue_items_html_soup(
    raw: bytes, have: int
) -> Optional[tuple[ET.Element, list[ET.Element]]]:
    """Re-parse broken RSS as HTML soup when the XML view lost most items
    (reference main.py:730-741)."""
    try:
        from .htmlsoup import parse_html_tree

        soup = parse_html_tree(raw)
        if soup is None:
            return None
        chan = soup.find(".//channel")
        if chan is None:
            return None
        found = chan.findall(".//item")
        if len(found) > have * 2:
            return chan, found
    except Exception:
        return None
    return None


def gate_non_feed_root(doc: XmlDoc, raw: bytes) -> None:
    """Raise for HTML/OPML/sitemap/status roots (reference main.py:608-634)."""
    kind = root_local(doc.root)
    base = NON_FEED_ROOTS.get(kind)
    if base is None:
        return
    detail = (_server_error_text(doc.root, raw) or "").strip()[:300] or "No error message"
    if detail != "No error message" and len(detail) > 10:
        raise ValueError(f"{base}: {detail[:150]}")
    raise ValueError(base)


def _server_error_text(root: ET.Element, raw: bytes) -> str:
    msg = root.text or ""
    if not msg:
        for name in ("message", "title", "h1", "h2", "h3", "h4", "p", "code"):
            try:
                el = root.find(f".//{name}")
                if el is None:
                    el = root.find(name)
                if el is not None and el.text:
                    return el.text
                for d in root.iter():
                    if isinstance(d.tag, str) and _local_of(d.tag) == name and d.text:
                        return d.text
            except Exception:
                continue
    if not msg or len(msg.strip()) < 5:
        try:
            joined = " ".join(t.strip() for t in root.itertext() if t and t.strip())
            joined = " ".join(joined.split())
            if joined:
                return joined[:300]
        except Exception:
            pass
        if raw:
            try:
                from .htmlsoup import parse_html_tree

                soup = parse_html_tree(raw)
                if soup is not None:
                    joined = " ".join(
                        t.strip() for t in soup.itertext() if t and t.strip()
                    )
                    joined = " ".join(joined.split())
                    if joined:
                        return joined[:300]
            except Exception:
                pass
        return "No error message"
    return msg


# ---------------------------------------------------------------------------
# small shared helpers
# ---------------------------------------------------------------------------

def _without_nones(d: dict[str, Any]) -> dict[str, Any]:
    return {k: v for k, v in d.items() if v is not None}


def _intify(d: dict[str, Any], keys: tuple[str, ...]) -> None:
    for k in keys:
        v = d.get(k)
        if v is None:
            continue
        try:
            d[k] = int(v)
        except (ValueError, TypeError):
            d.pop(k, None)


def _first_truthy(d: dict[str, Optional[str]], keys: tuple[str, ...]) -> Optional[str]:
    for k in keys:
        v = d.get(k)
        if v:
            return v
    return None


def _enclosure_dict(el: ET.Element) -> dict[str, Any]:
    enc: dict[str, Any] = {
        "url": el.get("url"),
        "type": el.get("type"),
        "length": el.get("length"),
    }
    ln = enc.get("length")
    if ln:
        try:
            enc["length"] = int(ln)
        except (ValueError, TypeError):
            enc.pop("length", None)
    return _without_nones(enc)


def parse_tags(
    elem: ET.Element, feed_type: str, atom_ns: Optional[str]
) -> Optional[list[dict[str, Optional[str]]]]:
    """Categories/subjects -> [{term, scheme, label}] (main.py:1063-1114)."""
    out: list[dict[str, Optional[str]]] = []
    if feed_type == "rss":
        for cat in elem.findall("category"):
            term = cat.text.strip() if cat.text else None
            if term:
                out.append({"term": term, "scheme": cat.get("domain"), "label": None})
        for subj in elem.findall(DC_SUBJECT):
            term = subj.text.strip() if subj.text else None
            if term:
                out.append({"term": term, "scheme": None, "label": None})
    elif feed_type == "atom":
        t = _tags_for(atom_ns or ATOM_NS_10)
        for cat in elem.findall(t["category"]):
            term = cat.get("term")
            if term:
                out.append(
                    {"term": term, "scheme": cat.get("scheme"), "label": cat.get("label")}
                )
    elif feed_type == "rdf":
        for subj in elem.findall(DC_SUBJECT):
            term = subj.text.strip() if subj.text else None
            if term:
                out.append({"term": term, "scheme": None, "label": None})
        for topic in elem.findall("{%s}topic" % TAXO_NS):
            resource = topic.get(RDF_RESOURCE)
            term = topic.text.strip() if topic.text else resource
            if term:
                out.append({"term": term, "scheme": resource, "label": None})
    return out or None


def extract_media(doc: XmlDoc, item: ET.Element) -> Optional[list[dict[str, Any]]]:
    """media:content / media:thumbnail structs (main.py:1272-1334); the
    parent-fallback lookups use the XmlDoc parent map in place of
    lxml's getparent()."""
    found: list[dict[str, Any]] = []
    for media in item.findall(".//" + MEDIA_CONTENT):
        rec: dict[str, Any] = {
            "url": media.get("url"),
            "type": media.get("type"),
            "medium": media.get("medium"),
            "width": media.get("width"),
            "height": media.get("height"),
        }
        _intify(rec, ("width", "height"))

        title = media.find(MEDIA_TITLE)
        if title is not None and title.text:
            rec["title"] = title.text.strip()
        text = media.find(MEDIA_TEXT)
        if text is not None and text.text:
            rec["text"] = text.text.strip()

        desc = media.find(MEDIA_DESC)
        if desc is None:
            parent = doc.parent_of(media)
            if parent is not None:
                desc = parent.find(MEDIA_DESC)
        if desc is not None and desc.text:
            rec["description"] = desc.text.strip()

        credit = media.find(MEDIA_CREDIT)
        if credit is None:
            parent = doc.parent_of(media)
            if parent is not None:
                credit = parent.find(MEDIA_CREDIT)
        if credit is not None and credit.text:
            rec["credit"] = credit.text.strip()
            rec["credit_scheme"] = credit.get("scheme")

        thumb = media.find(MEDIA_THUMB)
        if thumb is not None:
            rec["thumbnail_url"] = thumb.get("url")

        cleaned = _without_nones(rec)
        if cleaned:
            found.append(cleaned)

    if not found:
        for thumb in item.findall(".//" + MEDIA_THUMB):
            parent = doc.parent_of(thumb)
            if parent is None or parent.tag == MEDIA_CONTENT:
                continue
            rec = {
                "url": thumb.get("url"),
                "type": "image/jpeg",
                "width": thumb.get("width"),
                "height": thumb.get("height"),
            }
            _intify(rec, ("width", "height"))
            cleaned = _without_nones(rec)
            if cleaned:
                found.append(cleaned)

    return found or None


def fill_links(
    entry: dict[str, Any],
    link_elems: list[ET.Element],
    guid_text: Optional[str] = None,
    guid_is_permalink: bool = False,
) -> None:
    """Link selection: first rel=alternate wins; URL-shaped guid can
    override; rel edit/self dropped (main.py:1132-1176)."""
    links: list[dict[str, Optional[str]]] = []
    alternate: Optional[dict[str, Optional[str]]] = None
    for el in link_elems:
        rel = el.get("rel")
        href = el.get("href") or el.get("link")
        if not href:
            continue
        rec = {"rel": rel, "type": el.get("type"), "href": href, "title": el.get("title")}
        if rel == "alternate":
            if alternate is None:
                alternate = rec
            else:
                links.append(rec)
        elif rel not in {"edit", "self"}:
            links.append(rec)

    guid_is_url = guid_text is not None and guid_text.startswith(("http://", "https://"))
    if guid_is_url and "link" not in entry:
        entry["link"] = guid_text
        if alternate:
            links.insert(0, {"rel": "alternate", "type": "text/html", "href": guid_text})
    elif alternate:
        entry["link"] = alternate["href"]
        links.insert(0, alternate)
    elif "link" not in entry and guid_is_permalink:
        entry["link"] = guid_text
    entry["links"] = links


def summarize_content(entry: dict[str, Any]) -> None:
    """Synthesize a <=512-char description from content when the feed has
    none; conditional unescape/whitespace-collapse order matters for byte
    identity (main.py:1193-1212)."""
    if "description" in entry or "content" not in entry:
        return
    value = entry["content"][0]["value"]
    if value:
        if "<" in value and ">" in value:
            value = _RE_STRIP_TAGS.sub(" ", value[:2048])
            if "&" in value:
                value = _html.unescape(value)
        if "  " in value or "\n" in value or "\t" in value or "\r" in value:
            value = _RE_WS.sub(" ", value).strip()
        else:
            value = value.strip()
    entry["description"] = value[:512]


def fill_content(
    entry: dict[str, Any],
    doc: XmlDoc,
    item: ET.Element,
    content_el: Optional[ET.Element],
    rss_description_text: Optional[str],
) -> None:
    """content:encoded / atom:content -> [{type, language, base, value}]
    (main.py:1215-1269); xhtml-typed content serialized lxml-style."""
    if content_el is not None:
        ctype = content_el.get("type", "text/html")
        if ctype in {"xhtml", "application/xhtml+xml"}:
            value = serialize_subtree(doc, content_el)
        else:
            value = content_el.text or ""
        entry["content"] = [
            {
                "type": ctype,
                "language": content_el.get(XML_LANG),
                "base": content_el.get(XML_BASE),
                "value": value,
            }
        ]
    elif rss_description_text:
        entry["content"] = [
            {
                "type": "text/html",
                "language": item.get(XML_LANG),
                "base": item.get(XML_BASE),
                "value": rss_description_text,
            }
        ]
    summarize_content(entry)


# ---------------------------------------------------------------------------
# feed-level metadata
# ---------------------------------------------------------------------------

def extract_feed_info(
    channel: ET.Element,
    feed_type: str,
    atom_namespace: Optional[str],
    include_tags: bool = True,
) -> dict[str, Any]:
    """Feed-level seven-field cascade + details/links/id/generator
    (main.py:896-1060).  Note: feed-level dates stay RAW (no parsing)."""
    atom_ns = atom_namespace or ATOM_NS_10
    old_atom = atom_ns == ATOM_NS_03
    a = "{%s}" % atom_ns
    r1c = "{%s}channel/" % RSS1_NS
    updated_atom = a + ("modified" if old_atom else "updated")

    spec: tuple[tuple[str, str, str, str, bool], ...] = (
        ("title", "title", a + "title", r1c + "{%s}title" % RSS1_NS, False),
        ("link", "link", a + "link", r1c + "{%s}link" % RSS1_NS, True),
        ("subtitle", "description", a + "subtitle", r1c + "{%s}description" % RSS1_NS, False),
        ("generator", "generator", a + "generator", r1c + "{%s}generatorAgent" % MVCB_NS, False),
        ("publisher", "publisher", a + "publisher", r1c + "{%s}publisher" % DC_NS, False),
        ("author", "author", a + "author/" + a + "name", r1c + "{%s}creator" % DC_NS, False),
        ("updated", "lastBuildDate", updated_atom, r1c + "{%s}date" % DC_NS, False),
    )

    view = ElemView(channel)
    feed: dict[str, Any] = {}
    for name, rss_p, atom_p, rdf_p, is_attr in spec:
        got = cascade_value(view, feed_type, rss_p, atom_p, rdf_p, is_attr)
        if got:
            feed[name] = got

    lang = channel.get(XML_LANG)
    base = channel.get(XML_BASE)
    feed["language"] = lang
    if "title" in feed:
        feed["title_detail"] = {
            "type": "text/plain", "language": lang, "base": base, "value": feed["title"],
        }
    if "subtitle" in feed:
        feed["subtitle_detail"] = {
            "type": "text/plain", "language": lang, "base": base, "value": feed["subtitle"],
        }

    links: list[dict[str, Optional[str]]] = []
    feed["links"] = links
    chosen: Optional[str] = None
    for el in channel.findall(a + "link"):
        rel = el.get("rel")
        href = el.get("href") or el.get("link")
        if rel == "alternate" and href and not chosen:
            chosen = href
            links.append(
                {"rel": rel, "type": el.get("type"), "href": href, "title": el.get("title")}
            )
        elif rel is None and href:
            if not chosen:
                chosen = href
        elif rel not in {"hub", "self", "replies", "edit"}:
            links.append(
                {"rel": rel, "type": el.get("type"), "href": href, "title": el.get("title")}
            )
    if chosen:
        feed["link"] = chosen
        links.insert(0, {"rel": "alternate", "type": "text/html", "href": chosen})

    feed["id"] = view.value(a + "id")

    gen = channel.find(a + "generator")
    if gen is not None:
        feed["generator_detail"] = {
            "name": gen.text, "version": gen.get("version"), "href": gen.get("uri"),
        }

    if feed_type == "rss":
        comments = view.value("comments")
        if comments:
            feed["comments"] = comments

    if "publisher" not in feed:
        wm = view.value("webMaster")
        if wm:
            feed["publisher"] = wm
    if "author" not in feed:
        ed = view.value("managingEditor")
        if ed:
            feed["author"] = ed

    if include_tags:
        tags = parse_tags(channel, feed_type, atom_ns)
        if tags:
            feed["tags"] = tags

    return feed


# ---------------------------------------------------------------------------
# entry extraction: RSS fast path, Atom fast path, generic/RDF
# ---------------------------------------------------------------------------

def extract_entry_rss(
    doc: XmlDoc,
    item: ET.Element,
    atom_ns: str,
    has_media_ns: bool,
    include_content: bool,
    include_tags: bool,
    include_media: bool,
    include_enclosures: bool,
) -> dict[str, Any]:
    """Single-pass RSS 2.0 item extraction (main.py:1372-1553)."""
    t = _tags_for(atom_ns)
    by_local: dict[str, Optional[str]] = {}
    by_full: dict[str, Optional[str]] = {}
    atom_links: list[ET.Element] = []
    guid_el: Optional[ET.Element] = None
    encoded_el: Optional[ET.Element] = None
    plain_content_el: Optional[ET.Element] = None
    rss_desc: Optional[str] = None
    cats: list[dict[str, Optional[str]]] = []
    subjects: list[dict[str, Optional[str]]] = []
    enclosures: list[dict[str, Any]] = []

    for child in item:
        tag = child.tag
        if not isinstance(tag, str):
            continue
        text = child.text or None
        if tag not in by_full:
            by_full[tag] = text
        local = _local_of(tag)
        if local not in by_local:
            by_local[local] = text

        if tag == t["link"]:
            atom_links.append(child)
        elif tag == "guid":
            if guid_el is None:
                guid_el = child
        elif tag == CONTENT_ENCODED:
            if encoded_el is None:
                encoded_el = child
        elif tag == "content":
            if plain_content_el is None:
                plain_content_el = child
        elif tag == "description":
            if rss_desc is None:
                rss_desc = text

        if include_enclosures and tag == "enclosure":
            enc = _enclosure_dict(child)
            if enc.get("url"):
                enclosures.append(enc)

        if include_tags:
            if local == "category":
                term = text.strip() if text else None
                if term:
                    cats.append({"term": term, "scheme": child.get("domain"), "label": None})
            elif tag == DC_SUBJECT:
                term = text.strip() if text else None
                if term:
                    subjects.append({"term": term, "scheme": None, "label": None})

    entry: dict[str, Any] = {}
    rss_guid = by_local.get("guid")
    ident = by_full.get(t["id"]) or rss_guid or item.get(RDF_ABOUT)
    if ident:
        entry["id"] = ident.strip()

    title = by_local.get("title")
    if title:
        entry["title"] = title.strip()
    desc = _first_truthy(by_local, ("description", "summary"))
    if desc:
        entry["description"] = desc.strip()
    link = by_local.get("link")
    if link:
        entry["link"] = link.strip()

    pub_src = _first_truthy(by_local, ("pubdate", "published", "issued", "date"))
    if pub_src:
        pub = to_iso_utc(pub_src)
        if pub:
            entry["published"] = pub
    upd_src = _first_truthy(by_local, ("lastbuilddate", "updated", "modified"))
    if upd_src:
        upd = to_iso_utc(upd_src)
        if upd:
            entry["updated"] = upd
    if (
        "published" not in entry
        and rss_guid
        and not rss_guid.startswith(("http://", "https://"))
    ):
        from_guid = to_iso_utc(rss_guid)
        if from_guid:
            entry["published"] = from_guid
    if "updated" in entry and "published" not in entry:
        entry["published"] = entry["updated"]

    if atom_links:
        guid_text = guid_el.text.strip() if guid_el is not None and guid_el.text else None
        fill_links(
            entry,
            atom_links,
            guid_text=guid_text,
            guid_is_permalink=guid_el is not None and guid_el.get("isPermaLink") == "true",
        )
    else:
        entry["links"] = []
        if "link" not in entry and rss_guid and rss_guid.startswith(("http://", "https://")):
            entry["link"] = rss_guid

    if "id" not in entry and "link" in entry:
        entry["id"] = entry["link"]

    if include_content:
        fill_content(
            entry, doc, item,
            content_el=encoded_el if encoded_el is not None else plain_content_el,
            rss_description_text=rss_desc,
        )

    if include_media and has_media_ns:
        media = extract_media(doc, item)
        if media:
            entry["media_content"] = media

    if include_enclosures and enclosures:
        entry["enclosures"] = enclosures

    author = _first_truthy(by_local, ("author", "creator"))
    if not author:
        name_el = item.find(t["author_name"])
        author = name_el.text.strip() if name_el is not None and name_el.text else None
    if author:
        entry["author"] = author.strip()

    comments = by_local.get("comments")
    if comments:
        entry["comments"] = comments.strip()

    if include_tags and (cats or subjects):
        entry["tags"] = cats + subjects

    return entry


def extract_entry_atom(
    doc: XmlDoc,
    item: ET.Element,
    atom_ns: str,
    has_media_ns: bool,
    include_content: bool,
    include_tags: bool,
    include_media: bool,
    include_enclosures: bool,
) -> dict[str, Any]:
    """Single-pass Atom 0.3/1.0 entry extraction (main.py:1556-1689)."""
    t = _tags_for(atom_ns)
    atom_links: list[ET.Element] = []
    categories: list[dict[str, Optional[str]]] = []
    enclosures: list[dict[str, Any]] = []
    content_el: Optional[ET.Element] = None
    author_name: Optional[str] = None
    first_href: Optional[str] = None
    pub_src = upd_src = pub_fb = upd_fb = None

    entry: dict[str, Any] = {}
    for child in item:
        tag = child.tag
        if not isinstance(tag, str):
            continue
        text = child.text
        if tag == t["id"] and "id" not in entry and text:
            entry["id"] = text.strip()
        elif tag == t["title"] and "title" not in entry and text:
            entry["title"] = text.strip()
        elif tag == t["summary"] and "description" not in entry and text:
            entry["description"] = text.strip()
        elif tag == t["published"] and pub_src is None and text:
            pub_src = text
        elif tag == t["updated"] and upd_src is None and text:
            upd_src = text
        elif tag == t["pub_fallback"] and pub_fb is None and text:
            pub_fb = text
        elif tag == t["upd_fallback"] and upd_fb is None and text:
            upd_fb = text
        elif tag == t["link"]:
            atom_links.append(child)
            href = child.get("href")
            if href and first_href is None:
                first_href = href.strip()
        elif include_content and tag == t["content"] and content_el is None:
            content_el = child
        elif tag == t["author"] and author_name is None:
            name_el = child.find(t["name"])
            if name_el is not None and name_el.text:
                author_name = name_el.text.strip()

        if include_tags and tag == t["category"]:
            term = child.get("term")
            if term:
                categories.append(
                    {"term": term, "scheme": child.get("scheme"), "label": child.get("label")}
                )

        if include_enclosures and tag == "enclosure":
            enc = _enclosure_dict(child)
            if enc.get("url"):
                enclosures.append(enc)

    if first_href:
        entry["link"] = first_href

    if pub_src:
        pub = to_iso_utc(pub_src)
        if pub:
            entry["published"] = pub
    if upd_src:
        upd = to_iso_utc(upd_src)
        if upd:
            entry["updated"] = upd
    if "published" not in entry and pub_fb:
        pub = to_iso_utc(pub_fb)
        if pub:
            entry["published"] = pub
    if "updated" not in entry and upd_fb:
        upd = to_iso_utc(upd_fb)
        if upd:
            entry["updated"] = upd
    if "updated" in entry and "published" not in entry:
        entry["published"] = entry["updated"]

    fill_links(entry, atom_links)

    if "id" not in entry and "link" in entry:
        entry["id"] = entry["link"]

    if include_content:
        fill_content(entry, doc, item, content_el=content_el, rss_description_text=None)

    if include_media and has_media_ns:
        media = extract_media(doc, item)
        if media:
            entry["media_content"] = media

    if include_enclosures and enclosures:
        entry["enclosures"] = enclosures

    if author_name:
        entry["author"] = author_name

    if include_tags and categories:
        entry["tags"] = categories

    return entry


def extract_entry_generic(
    doc: XmlDoc,
    item: ET.Element,
    feed_type: str,
    atom_namespace: Optional[str],
    has_media_ns: bool,
    include_content: bool,
    include_tags: bool,
    include_media: bool,
    include_enclosures: bool,
) -> dict[str, Any]:
    """RDF / mixed-namespace entries via the generic field machinery
    (main.py:1692-1874)."""
    atom_ns = atom_namespace or ATOM_NS_10
    old_atom = atom_ns == ATOM_NS_03
    a = "{%s}" % atom_ns
    pub_field = a + ("issued" if old_atom else "published")
    upd_field = a + ("modified" if old_atom else "updated")
    pub_fb_field = a + ("published" if old_atom else "issued")
    upd_fb_field = a + ("updated" if old_atom else "modified")

    spec: tuple[tuple[str, str, str, str, bool], ...] = (
        ("title", "title", a + "title", "{%s}title" % RSS1_NS, False),
        ("link", "link", a + "link", "{%s}link" % RSS1_NS, True),
        ("description", "description", a + "summary", "{%s}description" % RSS1_NS, False),
        ("published", "pubDate", pub_field, "{%s}date" % DC_NS, False),
        ("updated", "lastBuildDate", upd_field, "{%s}modified" % DCTERMS_NS, False),
    )

    view = ElemView(item)
    entry: dict[str, Any] = {}
    rss_guid = view.value("guid")
    ident = view.value(a + "id") or rss_guid or item.get(RDF_ABOUT)
    if ident:
        entry["id"] = ident.strip()

    for name, rss_p, atom_p, rdf_p, is_attr in spec:
        got = cascade_value(view, feed_type, rss_p, atom_p, rdf_p, is_attr)
        if got:
            if name in {"published", "updated"}:
                got = to_iso_utc(got)
            entry[name] = got

    if "published" not in entry:
        fb = view.value(pub_fb_field)
        if fb:
            entry["published"] = to_iso_utc(fb)
    if "updated" not in entry:
        fb = view.value(upd_fb_field)
        if fb:
            entry["updated"] = to_iso_utc(fb)
    if (
        "published" not in entry
        and rss_guid
        and not rss_guid.startswith(("http://", "https://"))
    ):
        from_guid = to_iso_utc(rss_guid)
        if from_guid:
            entry["published"] = from_guid
    if "updated" in entry and "published" not in entry:
        entry["published"] = entry["updated"]

    guid = item.find("guid")
    guid_text = guid.text.strip() if guid is not None and guid.text else None
    fill_links(
        entry,
        item.findall(a + "link"),
        guid_text=guid_text,
        guid_is_permalink=guid is not None and guid.get("isPermaLink") == "true",
    )

    if "id" not in entry and "link" in entry:
        entry["id"] = entry["link"]

    if include_content:
        content_el: Optional[ET.Element] = None
        rss_desc: Optional[str] = None
        if feed_type == "rss":
            content_el = item.find(CONTENT_ENCODED)
            if content_el is None:
                content_el = item.find("content")
            d = item.find("description")
            if d is not None:
                rss_desc = d.text
        elif feed_type == "atom":
            content_el = item.find(_tags_for(atom_ns)["content"])
        fill_content(entry, doc, item, content_el=content_el, rss_description_text=rss_desc)

    if include_media and has_media_ns:
        media = extract_media(doc, item)
        if media:
            entry["media_content"] = media

    if include_enclosures:
        enclosures = [
            e for e in (_enclosure_dict(el) for el in item.findall("enclosure"))
            if e.get("url")
        ]
        if enclosures:
            entry["enclosures"] = enclosures

    author = cascade_value(
        view, feed_type, "author", a + "author/" + a + "name", DC_CREATOR, False
    )
    if not author:
        author = view.value(DC_CREATOR) or view.value("author")
    if author:
        entry["author"] = author

    if include_tags:
        tags = parse_tags(item, feed_type, atom_ns)
        if tags:
            entry["tags"] = tags

    return entry
