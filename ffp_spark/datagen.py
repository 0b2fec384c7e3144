"""Deterministic PAGES synthesis (SURVEY.md §7.1 step 1, FIXTURES.md §1).

Three corpus layers:

1. ``fixture_pages`` — the reference's 14 golden fixtures wrapped as rows
   (the byte-identity + triple-P/R oracle corpus).
2. ``corpus_pages`` — the reference's 200-feed benchmark cache (parity +
   throughput corpus; no goldens).
3. ``synth_pages`` — template RSS/Atom/RDF/JSON feeds generated
   *distributed* (spark.range -> mapInPandas), every row a pure function
   of (seed, id): no wall clock, no unseeded RNG.  Domains are
   Zipf-skewed (5 hot domains own ~30% of rows) to exercise salting;
   date formats cycle through the cascade's quirk branches; author
   surfaces include known near-duplicate clusters for entity linking.

Scales to any row count without driver materialization — the same
generator shape works at 10^9 rows on a real cluster.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
from pathlib import Path
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .schemas import PAGES_SCHEMA

REFERENCE_FIXTURES = Path("/root/reference/tests/integration")
BENCHMARK_CORPUS = Path("/root/reference/benchmark_data")

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

HOT_DOMAINS = (
    "hub.example.com",
    "mega.example.net",
    "popular.example.org",
    "viral.example.io",
    "big.example.dev",
)

# canonical author -> surface variants that char-3-gram MinHash SHOULD
# link (case/punct/affix variants; the linking oracle asserts these unify)
AUTHOR_CLUSTERS: dict[str, tuple[str, ...]] = {
    "david-bau": ("David Bau", "david bau", "Dr. David Bau", "David  Bau Jr"),
    "jane-doe": ("Jane Doe", "jane doe", "Ms Jane Doe", "Jane Doe PhD"),
    "wei-chen": ("Wei Chen", "wei chen", "Prof Wei Chen"),
    "maria-garcia": ("Maria Garcia", "maria garcia", "Maria Garcia-Lopez"),
    "alex-kim": ("Alex Kim", "alex kim", "Alex Kim (staff)"),
    "sam-patel": ("Sam Patel", "sam patel", "Sam Patel, Editor"),
    "li-wang": ("Li Wang", "li wang", "Li Wang 王"),
    "emma-brown": ("Emma Brown", "emma brown", "emma browne"),
}
# realistic hard variants (initials): present in the corpus, NOT expected
# to link by character shingles — kept out of the unification assertion
AUTHOR_HARD_VARIANTS: dict[str, tuple[str, ...]] = {
    "david-bau": ("D. Bau",),
    "jane-doe": ("J. Doe",),
    "wei-chen": ("W. Chen",),
}
_AUTHOR_KEYS = tuple(AUTHOR_CLUSTERS)

_DATE_STYLES = 6


def _h(seed: int, i: int, salt: str) -> int:
    digest = hashlib.md5(f"{seed}:{i}:{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def _domain(seed: int, i: int) -> str:
    r = _h(seed, i, "domain")
    if r % 10 < 3:  # 30% of rows on 5 hot domains (skew)
        return HOT_DOMAINS[r % len(HOT_DOMAINS)]
    return f"site-{r % 997}.example"


def _entry_date(seed: int, i: int, k: int) -> tuple[str, str]:
    """(raw date string for the feed, expected ISO-UTC normalization)."""
    base = _EPOCH + _dt.timedelta(seconds=(_h(seed, i, f"d{k}") % 31536000))
    style = _h(seed, i, f"ds{k}") % _DATE_STYLES
    iso = base.strftime("%Y-%m-%dT%H:%M:%S+00:00")
    if style == 0:
        return base.strftime("%Y-%m-%dT%H:%M:%SZ"), iso
    if style == 1:
        shifted = base.astimezone(_dt.timezone(_dt.timedelta(hours=-5)))
        return shifted.strftime("%Y-%m-%dT%H:%M:%S-05:00"), iso
    if style == 2:
        return base.strftime("%a, %d %b %Y %H:%M:%S GMT"), iso
    if style == 3:
        shifted = base.astimezone(_dt.timezone(_dt.timedelta(hours=-5)))
        return shifted.strftime("%a, %d %b %Y %H:%M:%S EST").replace(
            shifted.strftime("%H:"), shifted.strftime("%H:")
        ), iso
    if style == 4:
        return base.strftime("%Y-%m-%d %H:%M:%S UTC"), iso
    return base.strftime("%Y-%m-%dT%H:%M:%S+0000"), iso


def _author(seed: int, i: int, k: int) -> str:
    cluster = _AUTHOR_KEYS[_h(seed, i, f"ak{k}") % len(_AUTHOR_KEYS)]
    variants = AUTHOR_CLUSTERS[cluster] + AUTHOR_HARD_VARIANTS.get(cluster, ())
    return variants[_h(seed, i, f"av{k}") % len(variants)]


def author_cluster_oracle() -> dict[str, str]:
    """surface form -> canonical cluster id (golden_clusters fixture)."""
    out: dict[str, str] = {}
    for cid, variants in AUTHOR_CLUSTERS.items():
        for v in variants:
            out[v] = cid
    return out


def _body(seed: int, i: int, k: int) -> str:
    words = ["graph", "feed", "entry", "spark", "triple", "node", "edge",
             "parse", "link", "author", "update", "publish"]
    r = _h(seed, i, f"b{k}")
    picked = " ".join(words[(r >> (j * 4)) % len(words)] for j in range(12))
    return f"<p>{picked} item {i}-{k}</p>"


def _make_rss(seed: int, i: int, domain: str, n_entries: int) -> tuple[str, str]:
    items = []
    first_text = ""
    for k in range(n_entries):
        raw_date, _ = _entry_date(seed, i, k)
        body = _body(seed, i, k)
        if k == 0:
            first_text = body
        items.append(
            f"""<item>
<title>Post {i}-{k}</title>
<link>https://{domain}/post/{i}/{k}</link>
<guid isPermaLink="false">urn:{domain}:{i}:{k}</guid>
<pubDate>{raw_date}</pubDate>
<dc:creator>{_author(seed, i, k)}</dc:creator>
<description><![CDATA[{body}]]></description>
<category>cat-{_h(seed, i, f'c{k}') % 7}</category>
</item>"""
        )
    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0" xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:atom="http://www.w3.org/2005/Atom">
<channel>
<title>Feed {domain} #{i}</title>
<link>https://{domain}/</link>
<description>Synthetic feed {i}</description>
<atom:link rel="self" href="https://{domain}/feed-{i}.xml"/>
{''.join(items)}
</channel></rss>"""
    return xml, first_text


def _make_atom(seed: int, i: int, domain: str, n_entries: int) -> tuple[str, str]:
    entries = []
    first_text = ""
    for k in range(n_entries):
        raw_date, _ = _entry_date(seed, i, k)
        body = _body(seed, i, k)
        if k == 0:
            first_text = body
        entries.append(
            f"""<entry>
<id>tag:{domain},2025:/e/{i}/{k}</id>
<title>Entry {i}-{k}</title>
<link rel="alternate" href="https://{domain}/e/{i}/{k}"/>
<published>{raw_date}</published>
<updated>{raw_date}</updated>
<author><name>{_author(seed, i, k)}</name></author>
<content type="html">{body.replace('<', '&lt;').replace('>', '&gt;')}</content>
</entry>"""
        )
    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom {domain} #{i}</title>
<id>tag:{domain},2025:feed/{i}</id>
<link rel="alternate" href="https://{domain}/"/>
<link rel="self" href="https://{domain}/atom-{i}.xml"/>
{''.join(entries)}
</feed>"""
    return xml, first_text


def _make_rdf(seed: int, i: int, domain: str, n_entries: int) -> tuple[str, str]:
    items = []
    first_text = ""
    for k in range(n_entries):
        raw_date, _ = _entry_date(seed, i, k)
        body = _body(seed, i, k)
        if k == 0:
            first_text = body
        items.append(
            f"""<item rdf:about="https://{domain}/r/{i}/{k}">
<title>RDF {i}-{k}</title>
<link>https://{domain}/r/{i}/{k}</link>
<dc:date>{raw_date}</dc:date>
<dc:creator>{_author(seed, i, k)}</dc:creator>
<description>{body.replace('<', '&lt;').replace('>', '&gt;')}</description>
</item>"""
        )
    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
 xmlns="http://purl.org/rss/1.0/" xmlns:dc="http://purl.org/dc/elements/1.1/">
<channel rdf:about="https://{domain}/rdf-{i}">
<title>RDF feed {i}</title>
<link>https://{domain}/</link>
<description>rdf {i}</description>
</channel>
{''.join(items)}
</rdf:RDF>"""
    return xml, first_text


def _make_jsonfeed(seed: int, i: int, domain: str, n_entries: int) -> tuple[str, str]:
    items = []
    first_text = ""
    for k in range(n_entries):
        raw_date, iso = _entry_date(seed, i, k)
        body = _body(seed, i, k)
        if k == 0:
            first_text = body
        items.append(
            {
                "id": f"jf:{domain}:{i}:{k}",
                "url": f"https://{domain}/j/{i}/{k}",
                "title": f"JSON {i}-{k}",
                "content_html": body,
                "date_published": iso,
                "authors": [{"name": _author(seed, i, k)}],
            }
        )
    doc = {
        "version": "https://jsonfeed.org/version/1.1",
        "title": f"JSON feed {i}",
        "home_page_url": f"https://{domain}/",
        "feed_url": f"https://{domain}/feed-{i}.json",
        "items": items,
    }
    return json.dumps(doc), first_text


def synth_page(seed: int, i: int) -> dict[str, Any]:
    """One deterministic page row.  ~3% are deliberate error rows."""
    domain = _domain(seed, i)
    r = _h(seed, i, "kind")
    n_entries = 3 + (_h(seed, i, "n") % 10)
    url = f"https://{domain}/feed-{i}.xml"
    fail = _h(seed, i, "fail") % 100
    if fail < 2:  # HTML page instead of a feed
        payload = f"<!DOCTYPE html><html><body><h1>site {i}</h1></body></html>"
        return {"url": url, "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
                "html": payload.encode(), "text": "", "lang": "en"}
    if fail < 3:  # truncated feed: salvage may recover a prefix of the
        # items, so the text oracle is unknown (None), not "expected empty"
        xml, _ = _make_rss(seed, i, domain, n_entries)
        payload = xml[: int(len(xml) * 0.6)]
        return {"url": url, "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
                "html": payload.encode(), "text": None, "lang": "en"}
    pick = r % 10
    if pick < 5:
        xml, text = _make_rss(seed, i, domain, n_entries)
    elif pick < 8:
        xml, text = _make_atom(seed, i, domain, n_entries)
    elif pick < 9:
        xml, text = _make_rdf(seed, i, domain, n_entries)
    else:
        xml, text = _make_jsonfeed(seed, i, domain, n_entries)
        url = f"https://{domain}/feed-{i}.json"
    return {"url": url, "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
            "html": xml.encode(), "text": text, "lang": "en"}


def synth_pages(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic generation: no driver materialization.
    mapInArrow (not mapInPandas): binary payloads through pandas object
    arrays are the slow path."""
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(PAGES_SCHEMA)

    def gen(batches):
        import pyarrow as pa

        for batch in batches:
            rows = [synth_page(seed, int(i)) for i in batch.column("id").to_pylist()]
            yield pa.RecordBatch.from_pylist(rows, schema=arrow_schema)

    return spark.range(n).mapInArrow(gen, schema=PAGES_SCHEMA)


def fixture_pages(spark: SparkSession) -> DataFrame:
    """Reference golden fixtures as PAGES rows (byte-identity oracle)."""
    rows = []
    k = 0
    for f in sorted(REFERENCE_FIXTURES.glob("*.xml")):
        rows.append(
            {
                "url": f"https://fixtures.example/{f.name}",
                "warc_ts": _EPOCH + _dt.timedelta(seconds=k),
                "html": f.read_bytes(),
                "text": None,
                "lang": "en",
            }
        )
        k += 1
    for f in sorted(REFERENCE_FIXTURES.glob("*.json")):
        if f.name.endswith(".expected.json") or f.with_suffix(".xml").exists():
            continue
        rows.append(
            {
                "url": f"https://fixtures.example/{f.name}",
                "warc_ts": _EPOCH + _dt.timedelta(seconds=k),
                "html": f.read_bytes(),
                "text": None,
                "lang": "en",
            }
        )
        k += 1
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def corpus_pages(spark: SparkSession, replicate: int = 1) -> DataFrame:
    """200-feed benchmark cache as PAGES rows, optionally replicated with
    distinct urls (throughput corpus)."""
    rows = []
    files = sorted(BENCHMARK_CORPUS.glob("*")) if BENCHMARK_CORPUS.exists() else []
    k = 0
    for rep in range(replicate):
        for f in files:
            rows.append(
                {
                    "url": f"https://corpus.example/{rep}/{f.name}",
                    "warc_ts": _EPOCH + _dt.timedelta(seconds=k),
                    "html": f.read_bytes(),
                    "text": None,
                    "lang": "en",
                }
            )
            k += 1
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)
