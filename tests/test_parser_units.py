"""Unit tests mirroring the reference's tests/test_encoding.py plus
one vector per branch of the date cascade (reference main.py:2203-2304)."""

import pytest

from ffp_spark.feedparse import parse_feed, meta_refresh_url
from ffp_spark.feedparse.dates import to_iso_utc


RSS_LATIN1 = """<?xml version="1.0" encoding="iso-8859-1"?>
<rss version="2.0"><channel>
<title>caf\xe9 feed</title><link>https://x.example/</link>
<item><title>caf\xe9 entry</title><link>https://x.example/1</link></item>
</channel></rss>"""


class TestEncoding:
    def test_latin1_str_input(self):
        out = parse_feed(RSS_LATIN1)
        assert out["feed"]["title"] == "caf\xe9 feed"
        assert out["entries"][0]["title"] == "caf\xe9 entry"

    def test_latin1_bytes_input(self):
        out = parse_feed(RSS_LATIN1.encode("iso-8859-1"))
        assert out["feed"]["title"] == "caf\xe9 feed"

    def test_utf16_declared_utf8_bytes(self):
        xml = '<?xml version="1.0" encoding="utf-16"?><rss version="2.0"><channel><title>t</title><item><title>e</title></item></channel></rss>'
        out = parse_feed(xml.encode("utf-8"))
        assert out["entries"][0]["title"] == "e"


class TestMetaRefresh:
    def test_absolute(self):
        html = b'<html><head><meta http-equiv="refresh" content="0; url=https://new.example/feed"></head></html>'
        assert meta_refresh_url(html, "https://old.example/") == "https://new.example/feed"

    def test_relative_urljoin(self):
        html = b'<html><head><meta http-equiv="refresh" content="0; url=/feed.xml"></head></html>'
        assert meta_refresh_url(html, "https://a.example/x") == "https://a.example/feed.xml"

    def test_missing(self):
        assert meta_refresh_url(b"<html><body>hi</body></html>", "https://a.example/") is None

    def test_same_url_suppressed(self):
        html = b'<html><head><meta http-equiv="refresh" content="0; url=https://a.example/"></head></html>'
        assert meta_refresh_url(html, "https://a.example/") is None


ATOM_FULL = b"""<?xml version="1.0"?>
<rss version="2.0"><channel><title>t</title>
<item><guid>urn:e1</guid><title>e1</title>
<description>&lt;p&gt;body&lt;/p&gt;</description>
<category domain="s">x</category>
<enclosure url="https://a/av.mp3" type="audio/mpeg" length="123"/>
<link>https://a/1</link>
</item></channel></rss>"""


class TestIncludeFlags:
    def test_all_on(self):
        e = parse_feed(ATOM_FULL)["entries"][0]
        assert "content" in e and "tags" in e and "enclosures" in e

    def test_content_off(self):
        e = parse_feed(ATOM_FULL, include_content=False)["entries"][0]
        assert "content" not in e

    def test_tags_off(self):
        e = parse_feed(ATOM_FULL, include_tags=False)["entries"][0]
        assert "tags" not in e

    def test_enclosures_off(self):
        e = parse_feed(ATOM_FULL, include_enclosures=False)["entries"][0]
        assert "enclosures" not in e


DATE_VECTORS = [
    # (input, expected ISO-UTC string)
    ("2024-01-15T10:30:00Z", "2024-01-15T10:30:00+00:00"),
    ("2024-01-15T10:30:00+00:00", "2024-01-15T10:30:00+00:00"),
    ("2024-01-15T05:30:00-05:00", "2024-01-15T10:30:00+00:00"),
    ("Mon, 15 Jan 2024 10:30:00 GMT", "2024-01-15T10:30:00+00:00"),
    ("Mon, 15 Jan 2024 10:30:00 +0530", "2024-01-15T05:00:00+00:00"),
    ("Mon, 15 Jan 2024 10:30:00 EST", "2024-01-15T15:30:00+00:00"),
    ("15 Jan 2024 10:30:00 +0000", "2024-01-15T10:30:00+00:00"),
    ("2023-02-29T10:00:00Z", "2023-02-28T10:00:00+00:00"),  # bad leap day
    ("2024-02-29T10:00:00Z", "2024-02-29T10:00:00+00:00"),  # real leap day
    ("2024-01-15T24:30:00Z", "2024-01-16T00:30:00+00:00"),  # hour-24 rollover
    ("2024-01-15 10:30:00 UTC", "2024-01-15T10:30:00+00:00"),
    ("2024-01-15T10:30:00+0530", "2024-01-15T05:00:00+00:00"),
    ("2024-01-15T10:30:00+05", "2024-01-15T05:30:00+00:00"),
    ("2024-01-15T10:30:00.1234567Z", "2024-01-15T10:30:00.123456+00:00"),
    ("Wed, 20 Nov 2024 20:37:21 +0000", "2024-11-20T20:37:21+00:00"),
    ("", None),
    ("not a date", None),
    ("   ", None),
]


@pytest.mark.parametrize("raw,expected", DATE_VECTORS)
def test_date_cascade(raw, expected):
    assert to_iso_utc(raw) == expected


def test_feed_level_dates_stay_raw():
    """Feed-level updated is NOT normalized (davidbau golden keeps -05:00)."""
    rss = b"""<?xml version="1.0"?><rss version="2.0"><channel>
    <title>t</title><lastBuildDate>Mon, 15 Jan 2024 10:30:00 GMT</lastBuildDate>
    <item><title>e</title></item></channel></rss>"""
    out = parse_feed(rss)
    assert out["feed"]["updated"] == "Mon, 15 Jan 2024 10:30:00 GMT"
