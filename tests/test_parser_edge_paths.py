"""Parser paths the reference supports but no golden fixture exercises:
Atom 0.3 tag aliasing, RDF taxo:topic tags, guid-as-date fallback,
isPermaLink guid links, webMaster/managingEditor fallbacks, comments."""

from ffp_spark.feedparse import parse_feed


ATOM_03 = b"""<?xml version="1.0"?>
<feed xmlns="http://purl.org/atom/ns#">
<title>old atom</title>
<modified>2003-12-13T18:30:02Z</modified>
<entry>
<id>urn:e1</id><title>entry one</title>
<issued>2003-12-13T08:29:29-04:00</issued>
<modified>2003-12-13T18:30:02Z</modified>
<link rel="alternate" href="https://ex.example/1"/>
</entry></feed>"""


def test_atom_03_issued_modified_aliases():
    out = parse_feed(ATOM_03)
    e = out["entries"][0]
    assert e["published"] == "2003-12-13T12:29:29+00:00"  # issued -> published, UTC
    assert e["updated"] == "2003-12-13T18:30:02+00:00"  # modified -> updated
    assert out["feed"]["updated"] == "2003-12-13T18:30:02Z"  # feed-level stays raw


RDF_TAXO = b"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
 xmlns="http://purl.org/rss/1.0/"
 xmlns:dc="http://purl.org/dc/elements/1.1/"
 xmlns:taxo="http://purl.org/rss/1.0/modules/taxonomy/">
<channel rdf:about="https://r.example/">
<title>rdf feed</title><link>https://r.example/</link><description>d</description>
</channel>
<item rdf:about="https://r.example/1">
<title>item</title><link>https://r.example/1</link>
<dc:subject>subj-term</dc:subject>
<taxo:topic rdf:resource="https://r.example/topics/spark"/>
</item></rdf:RDF>"""


def test_rdf_taxo_topic_and_dc_subject_tags():
    out = parse_feed(RDF_TAXO)
    tags = out["entries"][0]["tags"]
    assert {"term": "subj-term", "scheme": None, "label": None} in tags
    assert {
        "term": "https://r.example/topics/spark",
        "scheme": "https://r.example/topics/spark",
        "label": None,
    } in tags
    assert out["entries"][0]["id"] == "https://r.example/1"  # rdf:about


def test_guid_as_date_fallback():
    rss = b"""<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>
    <item><title>e</title><guid isPermaLink="false">2024-03-01T12:00:00Z</guid></item>
    </channel></rss>"""
    e = parse_feed(rss)["entries"][0]
    assert e["published"] == "2024-03-01T12:00:00+00:00"


def test_permalink_guid_becomes_link():
    rss = b"""<?xml version="1.0"?><rss version="2.0"
    xmlns:atom="http://www.w3.org/2005/Atom"><channel><title>t</title>
    <item><title>e</title>
    <atom:link rel="self" href="https://x.example/self"/>
    <guid isPermaLink="true">https://x.example/posts/1</guid></item>
    </channel></rss>"""
    e = parse_feed(rss)["entries"][0]
    assert e["link"] == "https://x.example/posts/1"
    assert e["id"] == "https://x.example/posts/1"


def test_url_shaped_guid_without_atom_links():
    rss = b"""<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>
    <item><title>e</title><guid isPermaLink="false">https://x.example/p/9</guid></item>
    </channel></rss>"""
    e = parse_feed(rss)["entries"][0]
    assert e["link"] == "https://x.example/p/9"
    assert e["links"] == []


def test_webmaster_and_managing_editor_fallbacks():
    rss = b"""<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>
    <webMaster>web@x.example</webMaster>
    <managingEditor>ed@x.example</managingEditor>
    <comments>https://x.example/comments</comments>
    <item><title>e</title></item></channel></rss>"""
    feed = parse_feed(rss)["feed"]
    assert feed["publisher"] == "web@x.example"
    assert feed["author"] == "ed@x.example"
    assert feed["comments"] == "https://x.example/comments"


def test_entry_comments_and_dc_creator():
    rss = b"""<?xml version="1.0"?><rss version="2.0"
    xmlns:dc="http://purl.org/dc/elements/1.1/"><channel><title>t</title>
    <item><title>e</title><dc:creator>Jane</dc:creator>
    <comments>https://x.example/1#comments</comments></item></channel></rss>"""
    e = parse_feed(rss)["entries"][0]
    assert e["author"] == "Jane"
    assert e["author_detail"] == {"name": "Jane"}
    assert e["authors"] == [{"name": "Jane"}]
    assert e["comments"] == "https://x.example/1#comments"


def test_https_atom_namespace_variant():
    atom = b"""<?xml version="1.0"?>
    <feed xmlns="https://www.w3.org/2005/Atom"><title>t</title>
    <entry><id>urn:e</id><title>e</title>
    <link rel="alternate" href="https://y.example/1"/></entry></feed>"""
    out = parse_feed(atom)
    assert out["entries"][0]["link"] == "https://y.example/1"


def test_media_content_with_parent_fallback():
    rss = b"""<?xml version="1.0"?><rss version="2.0"
    xmlns:media="http://search.yahoo.com/mrss/"><channel><title>t</title>
    <item><title>e</title>
    <media:group>
      <media:content url="https://m.example/v.mp4" type="video/mp4" width="640" height="480"/>
      <media:description>group desc</media:description>
      <media:credit scheme="urn:ebu">Cam Era</media:credit>
    </media:group>
    </item></channel></rss>"""
    media = parse_feed(rss)["entries"][0]["media_content"]
    assert media == [
        {
            "url": "https://m.example/v.mp4",
            "type": "video/mp4",
            "width": 640,
            "height": 480,
            "description": "group desc",
            "credit": "Cam Era",
            "credit_scheme": "urn:ebu",
        }
    ]


def test_enclosure_length_dropped_when_not_int():
    rss = b"""<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>
    <item><title>e</title>
    <enclosure url="https://x/a.mp3" type="audio/mpeg" length="unknown"/>
    <enclosure url="https://x/b.mp3" type="audio/mpeg" length="123"/>
    </item></channel></rss>"""
    enc = parse_feed(rss)["entries"][0]["enclosures"]
    assert enc == [
        {"url": "https://x/a.mp3", "type": "audio/mpeg"},
        {"url": "https://x/b.mp3", "type": "audio/mpeg", "length": 123},
    ]
