"""Crawl-frontier generation — the crawler's scheduling artifact
(Nutch generate / Heritrix frontier): which URLs to fetch next, who
vouches for them, and in what per-host order.

frontier = (distinct outlink targets of the fetched pages)
           MINUS (everything already crawled),
           ranked per host for politeness.

Spark-first shape, three justified shuffles and nothing else:

1. discovery — ``page_links`` is the pure-codegen href scan (no
   Python); ``groupBy(dst)`` dedups candidates and counts referrers
   with a map-side partial agg, so a URL linked from 10^9 pages
   collapses inside each scan partition before the exchange ever
   sees it. The shuffle carries (url, count) — never page bytes.
2. seen-filter — LEFT ANTI join against the crawled-URL set, keyed
   on url. At 10^12 crawled rows both sides are huge: a shuffled
   hash anti-join on the url key is the right plan, and AQE turns it
   into a broadcast automatically when the crawled side is small
   (recrawl of one segment). Persist the crawled set bucketed by url
   (sources/bucketed.py) and this exchange disappears entirely.
3. politeness — a per-host window ranks candidates (referrer count
   desc, then url for a total order). With ``per_host_cap`` the
   rank<=k filter compiles to a map-side WindowGroupLimit
   (plan-asserted in tests/test_frontier.py), so a mega-host that
   accumulated 10^8 discovered URLs is bounded to k rows per
   partition BEFORE its host key is shuffled — the same skew pattern
   as hoststats.cap_per_host.

Robots/scheme/blocklist hygiene composes upstream or downstream
(operators/robots.robots_filter, the url_filter rules): this module
owns discovery, dedup-vs-seen, and ordering only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .links import host_of, page_links


def crawl_frontier(
    pages: DataFrame,
    crawled: DataFrame | None = None,
    per_host_cap: int | None = None,
    url_col: str = "url",
    html_col: str = "html",
    distinct_referrers: bool = False,
    redirect_aliases: DataFrame | None = None,
) -> DataFrame:
    """(url, host, n_referrers, fetch_order) for every discovered,
    not-yet-crawled URL. ``crawled`` is a one-column (url) frame of
    everything already fetched; it defaults to the input pages' own
    URLs (always excluded, even when an external set is supplied).
    ``fetch_order`` is the 1-based per-host politeness rank —
    most-referenced first, URL as the deterministic tiebreak.

    ``n_referrers`` counts link OCCURRENCES by default (page_links
    keeps duplicate links, so one page linking a target 50 times
    votes 50 times — the one-shuffle plan). ``distinct_referrers=True``
    counts distinct REFERRING PAGES instead — the spam-resistant rank
    signal real generators use (a link farm's repeated hrefs collapse
    to one vote) — at the cost of a second exchange: a partial-agg'd
    (src, dst) dedup shuffle ahead of the dst count. On the synthetic
    test corpus every link occurs once per page, so both modes agree
    with the oracle.

    ``redirect_aliases`` is a (src, final) frame — links.
    follow_redirects output — mapping known redirect sources to their
    chain's landing page: discovered candidates remap through it
    BEFORE the seen-filter, so a link to /old that 301s to an
    already-crawled /new never re-enters the frontier, and votes for
    /old and /new merge. Scale shape: the remap joins a POST-DEDUP
    slim set — the candidate table (occurrence mode) or the distinct
    (src, dst) pair set (distinct_referrers mode, where the remap must
    precede the per-page vote so a page linking both /old and its
    landing page still votes once) — never the raw link fan-in; AQE
    broadcasts small alias tables. Alias srcs are defensively
    collapsed to min(final) so a malformed (duplicated-src) alias
    table cannot fan votes out."""
    own = pages.select(F.col(url_col).alias("url"))
    seen = own if crawled is None else own.unionByName(
        crawled.select(F.col(crawled.columns[0]).alias("url"))
    )
    # defensive one-final-per-src collapse: nothing enforces that the
    # caller hands follow_redirects' already-unique output, and a
    # duplicated alias src would fan the join out and inflate votes
    al = None
    if redirect_aliases is not None:
        al = redirect_aliases.groupBy(
            F.col("src").alias("_asrc")
        ).agg(F.min("final").alias("_afinal"))
        # the SEEN set must speak the same (post-redirect) namespace
        # as the remapped candidates: a fetch log keyed by requested
        # urls holds /old, the candidate became /new, and an
        # unmapped anti-join would re-admit the already-delivered
        # landing page (review r05). Keep both forms — the requested
        # url itself stays excluded too.
        seen = seen.unionByName(
            seen.join(al, seen["url"] == al["_asrc"]).select(
                F.col("_afinal").alias("url")
            )
        )
    links = page_links(pages, url_col=url_col, html_col=html_col)
    if distinct_referrers:
        pairs = links.select("src", "dst").distinct()
        if al is not None:
            # remap BEFORE the per-page vote is cast: one page linking
            # both /old and its landing page /new must still count
            # once for /new, so the distinct re-runs on remapped pairs
            # (joins the slim distinct pair set, not the link fan-in)
            pairs = pairs.join(
                al, pairs["dst"] == al["_asrc"], "left"
            ).select(
                "src", F.coalesce("_afinal", "dst").alias("dst")
            ).distinct()
        cand = pairs.groupBy(F.col("dst").alias("url")).agg(
            F.count(F.lit(1)).alias("n_referrers")
        )
    else:
        cand = (
            links
            .groupBy(F.col("dst").alias("url"))
            .agg(F.count(F.lit(1)).alias("n_referrers"))
        )
        if al is not None:
            cand = (
                cand.join(al, cand["url"] == al["_asrc"], "left")
                .select(
                    F.coalesce("_afinal", "url").alias("url"), "n_referrers"
                )
                .groupBy("url")
                .agg(F.sum("n_referrers").alias("n_referrers"))
            )
    fresh = cand.join(seen, "url", "left_anti")
    w = Window.partitionBy("host").orderBy(
        F.desc("n_referrers"), F.col("url")
    )
    out = (
        fresh.withColumn("host", host_of(F.col("url")))
        .withColumn("fetch_order", F.row_number().over(w).cast("long"))
    )
    if per_host_cap is not None:
        out = out.filter(F.col("fetch_order") <= per_host_cap)
    return out.select("url", "host", "n_referrers", "fetch_order")
