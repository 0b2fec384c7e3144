"""North-rule per-row invariant THROUGH Spark: extracted text byte-
identical per url after the Arrow round trip (pure-Python parity is
necessary but not sufficient — Arrow string conversion is another seam).
"""

import json

import pytest

from ffp_spark.datagen import REFERENCE_FIXTURES, fixture_pages
from ffp_spark.udfs import parse_pages


def _goldens():
    out = {}
    for f in sorted(REFERENCE_FIXTURES.glob("*.xml")):
        out[f"https://fixtures.example/{f.name}"] = json.loads(
            f.with_suffix(".json").read_text()
        )
    for f in sorted(REFERENCE_FIXTURES.glob("*.json")):
        if f.name.endswith(".expected.json") or f.with_suffix(".xml").exists():
            continue
        out[f"https://fixtures.example/{f.name}"] = json.loads(
            f.with_suffix(".expected.json").read_text()
        )
    return out


def test_content_and_description_byte_identical_through_spark(spark):
    goldens = _goldens()
    rows = (
        parse_pages(fixture_pages(spark))
        .selectExpr(
            "url",
            "transform(entries, e -> e.description) AS descriptions",
            "transform(entries, e -> e.content[0].value) AS contents",
            "transform(entries, e -> e.id) AS ids",
            "transform(entries, e -> e.published) AS published",
        )
        .collect()
    )
    assert len(rows) == len(goldens)
    for r in rows:
        golden_entries = goldens[r.url]["entries"]
        assert len(r.ids) == len(golden_entries), r.url
        for i, ge in enumerate(golden_entries):
            assert r.descriptions[i] == ge.get("description"), (r.url, i)
            golden_content = ge.get("content")
            ours = r.contents[i]
            if golden_content:
                assert ours == golden_content[0]["value"], (r.url, i)
            else:
                assert ours is None, (r.url, i)
            assert r.ids[i] == ge.get("id"), (r.url, i)
            assert r.published[i] == ge.get("published"), (r.url, i)
