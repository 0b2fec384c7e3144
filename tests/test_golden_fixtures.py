"""Golden-fixture parity: our parser's dict output must deep-equal the
reference's checked-in goldens (reference tests/test_integration.py:34-52).

The reference itself cannot run in this sandbox (lxml unavailable), so
its goldens are the oracle; this is also the source corpus for the
triple-level P/R metric (BASELINE.json north metric).
"""

import json
from pathlib import Path

import pytest

from ffp_spark.feedparse import parse_feed

INTEGRATION = Path("/root/reference/tests/integration")


def _fixture_paths():
    xmls = sorted(INTEGRATION.glob("*.xml"))
    json_feeds = [
        f
        for f in INTEGRATION.glob("*.json")
        if not f.name.endswith(".expected.json") and not f.with_suffix(".xml").exists()
    ]
    return sorted(xmls + json_feeds)


@pytest.mark.parametrize("feed_path", _fixture_paths(), ids=lambda p: p.name)
def test_golden_parity(feed_path: Path):
    if feed_path.suffix == ".json":
        golden_path = feed_path.with_suffix(".expected.json")
    else:
        golden_path = feed_path.with_suffix(".json")
    golden = json.loads(golden_path.read_text())
    parsed = parse_feed(feed_path.read_bytes())
    assert parsed == golden


@pytest.mark.parametrize("feed_path", _fixture_paths(), ids=lambda p: p.name)
def test_byte_identical_extracted_text(feed_path: Path):
    """The north rule's per-row invariant: extracted text byte-identical
    per url — checked on entries[*].content[0].value and description."""
    if feed_path.suffix == ".json":
        golden_path = feed_path.with_suffix(".expected.json")
    else:
        golden_path = feed_path.with_suffix(".json")
    golden = json.loads(golden_path.read_text())
    parsed = parse_feed(feed_path.read_bytes())
    for ours, theirs in zip(parsed["entries"], golden["entries"]):
        assert ours.get("description") == theirs.get("description")
        ours_content = ours.get("content")
        theirs_content = theirs.get("content")
        if theirs_content:
            assert ours_content is not None
            assert ours_content[0]["value"] == theirs_content[0]["value"]
        else:
            assert not ours_content
