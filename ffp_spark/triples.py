"""Triple emission (operator K2): PARSED -> (subj, pred, obj) rows.

Vocabulary (north_star spec): item->publishedAt, item->author,
item->partOfFeed, feed->hasEntry.  Pure DataFrame ops: one explode, four
narrow projections, unionByName — no shuffle until the caller aggregates.
Subject/object ids follow the reference's id-resolution rules
(entry.id with link fallback, main.py:1445-1450; feed node id =
coalesce(feed.id, feed.link)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .schemas import (
    PRED_AUTHOR,
    PRED_HAS_ENTRY,
    PRED_PART_OF_FEED,
    PRED_PUBLISHED_AT,
)


def exploded_entries(parsed: DataFrame) -> DataFrame:
    """One row per (page, entry); nested-schema pruning keeps the scan
    narrow when callers select few entry fields."""
    ok = parsed.filter(F.col("error").isNull() & F.col("entries").isNotNull())
    return ok.select(
        "url",
        F.coalesce(F.col("feed.id"), F.col("feed.link")).alias("feed_node"),
        F.explode("entries").alias("entry"),
    )


def emit_triples(parsed: DataFrame) -> DataFrame:
    """PARSED -> TRIPLES (subj, pred, obj, src_url).

    Single-pass: one explode + one generator projection.  (A union of
    four per-predicate projections reads cleaner but Catalyst does not
    de-duplicate the shared mapInPandas subtree, so the Python parse
    stage would execute once per union branch — 4x the work.)"""
    e = exploded_entries(parsed).select(
        "url",
        "feed_node",
        F.col("entry.id").alias("entry_id"),
        F.col("entry.published").alias("published"),
        F.col("entry.author").alias("author"),
    )

    def quad(subj, pred: str, obj):
        return F.struct(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
        )

    triples = e.select(
        F.explode(
            F.array(
                quad(F.col("entry_id"), PRED_PUBLISHED_AT, F.col("published")),
                quad(F.col("entry_id"), PRED_AUTHOR, F.col("author")),
                quad(F.col("entry_id"), PRED_PART_OF_FEED, F.col("feed_node")),
                quad(F.col("feed_node"), PRED_HAS_ENTRY, F.col("entry_id")),
            )
        ).alias("t"),
        F.col("url").alias("src_url"),
    ).select("t.subj", "t.pred", "t.obj", "src_url")
    return triples.filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())


def triples_from_golden_dicts(goldens: dict[str, dict]) -> list[tuple[str, str, str, str]]:
    """Mechanically derive the golden triple set from the reference's
    golden parse dicts (FIXTURES.md §3) — the P/R oracle, no Spark."""
    out: list[tuple[str, str, str, str]] = []
    for url, parsed in goldens.items():
        feed = parsed.get("feed", {})
        feed_node = feed.get("id") or feed.get("link")
        for entry in parsed.get("entries", []):
            eid = entry.get("id")
            if eid is None:
                continue
            published = entry.get("published")
            if published is not None:
                out.append((eid, PRED_PUBLISHED_AT, published, url))
            author = entry.get("author")
            if author is not None:
                out.append((eid, PRED_AUTHOR, author, url))
            if feed_node is not None:
                out.append((eid, PRED_PART_OF_FEED, feed_node, url))
                out.append((feed_node, PRED_HAS_ENTRY, eid, url))
    return out
