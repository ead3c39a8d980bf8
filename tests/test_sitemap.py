"""Sitemap ingestion (operators/sitemap): urlset + sitemapindex
parsing semantics on hand-built XML (CDATA, entity unescape, trim,
null/double contracts), the zero-shuffle plan shape, the discovery
composition, and the robots.txt ``Sitemap:`` directive."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.robots import robots_sitemaps  # noqa: E402
from nidaba_spark.operators.sitemap import (  # noqa: E402
    sitemap_discoveries,
    sitemap_entries,
)

_URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.com/p?x=1&amp;y=2 </loc>
    <lastmod>2026-03-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://a.com/cdata]]></loc></url>
  <url><priority>not-a-number</priority><loc>https://a.com/bad-prio</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>"""

_INDEX = b"""<sitemapindex>
  <sitemap><loc>https://a.com/sitemap-1.xml</loc><lastmod>2026-02-02</lastmod></sitemap>
  <sitemap><loc>https://a.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml", bytearray(_URLSET)),
            ("https://a.com/sitemap_index.xml", bytearray(_INDEX)),
        ],
        "url string, html binary",
    )


def test_sitemap_entries_semantics(pages):
    rows = {
        (r["sitemap_url"], r["loc"]): r
        for r in sitemap_entries(pages).collect()
    }
    # loc-less blocks drop: 3 url entries + 2 sitemap entries
    assert len(rows) == 5
    full = rows[("https://a.com/sitemap.xml", "https://a.com/p?x=1&y=2")]
    assert (full["kind"], full["lastmod"], full["changefreq"], full["priority"]) == (
        "url", "2026-03-01", "daily", 0.8,
    )  # trimmed loc, &amp; unescaped
    cdata = rows[("https://a.com/sitemap.xml", "https://a.com/cdata")]
    assert (cdata["lastmod"], cdata["changefreq"], cdata["priority"]) == (
        None, None, None,
    )
    assert rows[("https://a.com/sitemap.xml", "https://a.com/bad-prio")][
        "priority"
    ] is None  # try_cast, not a task kill
    idx1 = rows[("https://a.com/sitemap_index.xml", "https://a.com/sitemap-1.xml")]
    assert (idx1["kind"], idx1["lastmod"]) == ("sitemap", "2026-02-02")
    assert rows[
        ("https://a.com/sitemap_index.xml", "https://a.com/sitemap-2.xml")
    ]["kind"] == "sitemap"


def test_sitemap_entries_zero_shuffle_plan(pages):
    plan = (
        sitemap_entries(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure codegen scan


def test_sitemap_double_unescape_guard(spark):
    # an escaped literal '&lt;' (&amp;lt;) must come out as '&lt;',
    # not '<' — &amp; is unescaped LAST
    xml = b"<urlset><url><loc>https://a.com/q?v=&amp;lt;tag&amp;gt;</loc></url></urlset>"
    df = spark.createDataFrame(
        [("https://a.com/s.xml", bytearray(xml))], "url string, html binary"
    )
    assert sitemap_entries(df).collect()[0]["loc"] == "https://a.com/q?v=&lt;tag&gt;"


def test_sitemap_discoveries_anti_join(spark, pages):
    crawled = spark.createDataFrame(
        [("https://a.com/cdata",)], "url string"
    )
    got = {
        r["url"] for r in sitemap_discoveries(pages, crawled).collect()
    }
    # sitemap-kind locs are NOT page candidates; crawled loc excluded
    assert got == {"https://a.com/p?x=1&y=2", "https://a.com/bad-prio"}


def test_robots_sitemaps_directive(spark):
    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /x\n"
                "Sitemap: https://a.com/sitemap.xml\n"
                "sitemap: https://a.com/sitemap2.xml  # case + comment\n"
                "Sitemap: https://a.com/sitemap.xml\n"  # duplicate collapses
                "Sitemap: /relative-dropped.xml\n",
            ),
            ("b.com", "User-agent: *\nAllow: /\n"),
        ],
        "host string, robots_txt string",
    )
    got = sorted(
        (r["host"], r["sitemap_url"]) for r in robots_sitemaps(robots).collect()
    )
    assert got == [
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://a.com/sitemap2.xml"),
    ]
