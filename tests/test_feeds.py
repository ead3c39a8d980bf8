"""Feed ingestion semantics on hand-built RSS/Atom documents — the
oracle queries check the synthesized arithmetic corpus; these pin the
tricky per-spec behaviors directly."""

from __future__ import annotations

import pytest

from nidaba_spark.operators.feeds import feed_entries, page_feed_links

RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel><title>Blog</title>'
    "<item><title>First &amp; best</title><link> https://b.example/p/1 </link>"
    "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate><guid>g-1</guid></item>"
    "<item><link><![CDATA[https://b.example/p/2?a=1&amp;b=2]]></link></item>"
    "<item><title>no link so dropped</title></item>"
    "</channel></rss>"
)
ATOM = (
    '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
    '<entry><title>A1</title><link rel="self" href="https://a.example/feed.atom"/>'
    '<link href="/posts/1"/><published>2024-01-02T03:04:05Z</published>'
    "<id>tag:1</id></entry>"
    '<entry xml:lang="en"><link rel="alternate" href="https://a.example/posts/2"/>'
    "<updated>2024-02-02T00:00:00Z</updated></entry>"
    '<entry><link rel="enclosure" href="https://a.example/x.mp3"/></entry>'
    "</feed>"
)
PAGE = (
    "<html><head>"
    '<link rel="alternate" type="application/rss+xml" href="/feed.xml" title="R">'
    '<link type="application/atom+xml" rel="alternate" '
    'href="https://p.example/feed.atom">'
    '<link rel="stylesheet" href="/s.css">'
    '<link rel="alternate" type="text/html" href="/en">'
    "</head><body></body></html>"
)


@pytest.fixture(scope="module")
def feeds(spark):
    return spark.createDataFrame(
        [
            ("https://b.example/feed.rss", bytearray(RSS.encode())),
            ("https://a.example/feed.atom", bytearray(ATOM.encode())),
        ],
        "url string, html binary",
    )


def test_feed_entry_semantics(spark, feeds):
    got = {
        (r["kind"], r["loc"]): (r["title"], r["published"], r["guid"])
        for r in feed_entries(feeds).collect()
    }
    assert got == {
        # whitespace trimmed, entities unescaped, all fields carried
        ("rss", "https://b.example/p/1"): (
            "First & best", "Mon, 01 Jan 2024 00:00:00 GMT", "g-1",
        ),
        # CDATA link + &amp; in query string; absent fields null
        ("rss", "https://b.example/p/2?a=1&b=2"): (None, None, None),
        # rel="self" listed FIRST is skipped; rel-less href IS the
        # alternate (RFC 4287 default); relative resolved vs feed url
        ("atom", "https://a.example/posts/1"): (
            "A1", "2024-01-02T03:04:05Z", "tag:1",
        ),
        # explicit rel="alternate"; published falls back to updated
        ("atom", "https://a.example/posts/2"): (
            None, "2024-02-02T00:00:00Z", None,
        ),
        # the enclosure-only entry and the linkless item are ABSENT
    }


def test_feed_discovery_decoys_and_resolution(spark):
    pages = spark.createDataFrame(
        [("https://p.example/page", bytearray(PAGE.encode()))],
        "url string, html binary",
    )
    got = {
        (r["feed_url"], r["feed_type"])
        for r in page_feed_links(pages).collect()
    }
    assert got == {
        ("https://p.example/feed.xml", "rss"),
        ("https://p.example/feed.atom", "atom"),
    }  # stylesheet + text/html alternates excluded


def test_feed_entries_plan_is_one_narrow_scan(spark, feeds):
    plan = feed_entries(feeds)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: scan → generate → project


def test_attribute_bearing_tags_still_extract(spark):
    """RSS 2.0's own example is <guid isPermaLink="false">; Atom titles
    routinely carry type="html" — attribute-bearing tags must not null
    the field (review r05)."""
    rss = (
        '<rss><channel><item><title type="text">T</title>'
        "<link>https://x.example/p</link>"
        '<guid isPermaLink="false">g-77</guid></item></channel></rss>'
    )
    feeds = spark.createDataFrame(
        [("https://x.example/f.rss", bytearray(rss.encode()))],
        "url string, html binary",
    )
    [r] = feed_entries(feeds).collect()
    assert (r["title"], r["guid"]) == ("T", "g-77")


def test_string_xml_column_accepted_by_both(spark):
    """feed_entries and page_feed_links agree on input schemas: a
    string html column works without a binary round-trip (review r05)."""
    df = spark.createDataFrame(
        [(
            "https://s.example/pg",
            '<html><head><link rel="alternate" '
            'type="application/rss+xml" href="/f.xml"></head></html>',
        )],
        "url string, html string",
    )
    [r] = page_feed_links(df).collect()
    assert (r["feed_url"], r["feed_type"]) == ("https://s.example/f.xml", "rss")
