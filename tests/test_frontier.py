"""Crawl-frontier semantics on hand-built pages (discovery, dedup vs
the crawled set, per-host politeness order) + the skew-critical plan
shape: the host cap must compile to a map-side WindowGroupLimit so a
mega-host is bounded before its key is shuffled."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.frontier import crawl_frontier  # noqa: E402


def _page(url: str, *hrefs: str) -> tuple[str, bytearray]:
    body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    return url, bytearray(f"<html><body>{body}</body></html>".encode())


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        _page("https://a.com/1", "/2", "https://b.com/x", "https://c.com/y"),
        _page("https://a.com/2", "/1", "https://b.com/x"),
        _page("https://b.com/x", "https://a.com/1", "/z"),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_frontier_excludes_own_urls_and_ranks(pages):
    got = {
        r["url"]: (r["n_referrers"], r["host"], r["fetch_order"])
        for r in crawl_frontier(pages).collect()
    }
    # /1, /2, b.com/x are crawled (own urls); c.com/y and b.com/z are new
    assert got == {
        "https://c.com/y": (1, "c.com", 1),
        "https://b.com/z": (1, "b.com", 1),
    }


def test_frontier_referrer_counts_and_order(spark):
    # two seed pages both link b.com/x; one also links b.com/z:
    # counts drive the per-host politeness order
    rows_in = [
        _page("https://seed.com/1", "https://b.com/x", "https://b.com/z"),
        _page("https://seed.com/2", "https://b.com/x"),
    ]
    seeds = spark.createDataFrame(rows_in, "url string, html binary")
    rows = crawl_frontier(seeds).collect()
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://b.com/x"]["n_referrers"] == 2
    border = {r["url"]: r["fetch_order"] for r in rows if r["host"] == "b.com"}
    assert border == {"https://b.com/x": 1, "https://b.com/z": 2}


def test_frontier_distinct_referrers_collapses_repeated_links(spark):
    # one spam page links b.com/x 5 times; an honest page links it
    # once and b.com/z once. Occurrence mode ranks x by 6 votes;
    # distinct mode gives x 2 votes (pages, not hrefs) — and the
    # modes must DISAGREE here by construction.
    rows_in = [
        _page("https://spam.com/1", *(["https://b.com/x"] * 5)),
        _page("https://seed.com/2", "https://b.com/x", "https://b.com/z"),
    ]
    seeds = spark.createDataFrame(rows_in, "url string, html binary")
    occ = {r["url"]: r["n_referrers"] for r in crawl_frontier(seeds).collect()}
    dis = {
        r["url"]: r["n_referrers"]
        for r in crawl_frontier(seeds, distinct_referrers=True).collect()
    }
    assert occ == {"https://b.com/x": 6, "https://b.com/z": 1}
    assert dis == {"https://b.com/x": 2, "https://b.com/z": 1}


def test_frontier_cap_plan_is_window_group_limit(pages):
    capped = crawl_frontier(pages, per_host_cap=5)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # and the cap applies
    big = crawl_frontier(pages, per_host_cap=1).collect()
    assert all(r["fetch_order"] <= 1 for r in big)


def test_frontier_external_crawled_composes_with_own(spark, pages):
    crawled = spark.createDataFrame([("https://c.com/y",)], "url string")
    urls = {r["url"] for r in crawl_frontier(pages, crawled=crawled).collect()}
    assert urls == {"https://b.com/z"}  # own urls STILL excluded


def test_frontier_redirect_aliases_remap_and_merge(spark):
    """Candidates remap through the redirect alias table before the
    seen-filter: /old → already-crawled /new never re-enters; votes
    for an alias source and its landing page merge; unaliased
    candidates pass through."""
    pages = spark.createDataFrame(
        [
            _page("https://s.com/1", "https://t.com/old", "https://t.com/fresh-old"),
            _page("https://s.com/2", "https://t.com/old", "https://t.com/new"),
            _page("https://s.com/3", "https://u.com/plain"),
        ],
        "url string, html binary",
    )
    aliases = spark.createDataFrame(
        [
            ("https://t.com/old", "https://t.com/new"),
            ("https://t.com/fresh-old", "https://t.com/fresh-new"),
        ],
        "src string, final string",
    )
    crawled = spark.createDataFrame([("https://t.com/new",)], "url string")
    got = {
        r["url"]: r["n_referrers"]
        for r in crawl_frontier(
            pages, crawled=crawled, redirect_aliases=aliases
        ).collect()
    }
    # /old's 2 votes + /new's 1 vote merged onto /new — then dropped
    # as crawled; /fresh-old remaps to its (uncrawled) landing page
    assert got == {
        "https://t.com/fresh-new": 1,
        "https://u.com/plain": 1,
    }
    # without aliases the raw targets surface and /old re-enters
    raw = {
        r["url"]
        for r in crawl_frontier(pages, crawled=crawled).collect()
    }
    assert "https://t.com/old" in raw and "https://t.com/fresh-old" in raw


def test_frontier_aliases_respect_distinct_referrers(spark):
    """One page linking both /old and its landing page /new votes ONCE
    for /new under distinct_referrers (the remap precedes the per-page
    vote); a duplicated-src alias table cannot fan votes out."""
    pages = spark.createDataFrame(
        [_page("https://s.com/1", "https://t.com/old", "https://t.com/new",
               "https://t.com/old")],
        "url string, html binary",
    )
    aliases = spark.createDataFrame(
        [("https://t.com/old", "https://t.com/new"),
         ("https://t.com/old", "https://t.com/zzz")],  # malformed dup src
        "src string, final string",
    )
    got = {
        r["url"]: r["n_referrers"]
        for r in crawl_frontier(
            pages, distinct_referrers=True, redirect_aliases=aliases
        ).collect()
    }
    assert got == {"https://t.com/new": 1}
    # occurrence mode still counts the raw 3 votes, merged onto /new
    occ = {
        r["url"]: r["n_referrers"]
        for r in crawl_frontier(pages, redirect_aliases=aliases).collect()
    }
    assert occ == {"https://t.com/new": 3}


def test_frontier_aliases_exclude_crawled_landing_pages(spark):
    # the fetch log records REQUESTED urls: crawled /old (which 301s
    # to /new) means /new's content was already delivered, so a link
    # to /old (remapped to /new) must NOT re-enter the frontier
    s = "https://al.example.com"
    pages = spark.createDataFrame(
        [
            (
                f"{s}/page",
                f'<html><body><a href="{s}/old">x</a>'
                f'<a href="{s}/fresh">y</a></body></html>'.encode(),
            )
        ],
        "url string, html binary",
    )
    crawled = spark.createDataFrame([(f"{s}/old",)], "url string")
    aliases = spark.createDataFrame(
        [(f"{s}/old", f"{s}/new")], "src string, final string"
    )
    got = {
        r["url"]
        for r in crawl_frontier(
            pages, crawled=crawled, redirect_aliases=aliases
        ).collect()
    }
    assert got == {f"{s}/fresh"}  # /new excluded: already delivered
