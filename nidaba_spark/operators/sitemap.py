"""Sitemap ingestion (sitemaps.org protocol) — the third leg of the
crawl-side discovery story next to operators/robots.py (may we fetch?)
and operators/frontier.py (what did pages link?): sitemaps are what the
SITE tells the crawler exists, and real crawl frontiers merge all
three signals.

Two artifacts are parsed, both as pure whole-stage-codegen expressions
over the latin-1 byte view (links.html_text — never throws, preserves
the ASCII bytes XML syntax is made of):

  * ``sitemap_entries`` — urlset files (``<url><loc>…``) and sitemap
    INDEX files (``<sitemapindex><sitemap><loc>…``) in one scan: each
    page's two block arrays are concatenated into a single explode, so
    a mixed drop of 10^9 sitemap files is one narrow map stage — zero
    shuffles, no Python, page bytes never leave the scan.
  * ``robots.robots_sitemaps`` — the ``Sitemap:`` robots.txt directive
    (group-independent per the protocol: it applies regardless of any
    User-agent group), which is where crawlers DISCOVER sitemap URLs.

Subset implemented (documented, standard-practice bounds): bare
``<url>``/``<sitemap>``/tag spellings as sitemaps.org specifies (no
attribute or namespace-prefixed forms — real sitemap emitters write
the canonical tags); ``<loc>`` CDATA wrapping tolerated; the five
predefined XML entities unescaped in loc values (``&amp;`` last, so
``&amp;lt;`` round-trips correctly); lastmod kept as the raw W3C
datetime STRING (sitemaps mix date-only and full-timestamp forms —
casting is the consumer's call); priority cast to double (null when
absent/garbage). Gzip'd sitemap files decompress at ingest
(sources/rawfiles) before this scan sees them.

Frontier composition: ``sitemap_entries(...).filter(kind='url')``
locs are discovery candidates exactly like page_links dsts — anti-join
the crawled set (or union them into crawl_frontier's candidate side);
``kind='sitemap'`` locs are MORE SITEMAPS to fetch, i.e. frontier
entries for the sitemap fetcher itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .links import html_text, strip_html_comments

_URL_BLOCK = r"(?is)<url>(.*?)</url>"
_SM_BLOCK = r"(?is)<sitemap>(.*?)</sitemap>"


def _tag(block: Column, name: str) -> Column:
    """Trimmed inner text of ``<name>…</name>`` inside one block ('' when
    absent); optional CDATA wrapper stripped."""
    return F.regexp_extract(
        block,
        rf"(?is)<{name}>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</{name}>",
        1,
    )


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities. ``&amp;`` must be LAST so
    ``&amp;lt;`` (an escaped literal ``&lt;``) becomes ``&lt;``, not
    ``<``."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _blank_null(c: Column) -> Column:
    return F.when(c == "", F.lit(None).cast("string")).otherwise(c)


def sitemap_entries(
    pages: DataFrame, url_col: str = "url", xml_col: str = "html"
) -> DataFrame:
    """(sitemap_url, kind, loc, lastmod, changefreq, priority) — one
    row per ``<url>`` (kind='url') or ``<sitemap>`` (kind='sitemap')
    block across every input file, urlset and index files handled in
    the SAME scan. Blocks without a ``<loc>`` drop (a sitemap entry is
    its loc); lastmod/changefreq are null when absent, priority is a
    nullable double. See the module docstring for the parsed subset
    and the scale shape (one narrow codegen projection, zero
    shuffles)."""
    xml = F.col(xml_col)
    if isinstance(pages.schema[xml_col].dataType, T.BinaryType):
        xml = html_text(xml)
    xml = strip_html_comments(xml)
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(xml, F.lit(_URL_BLOCK), F.lit(1)),
            lambda b: F.struct(
                F.lit("url").alias("kind"), b.alias("block")
            ),
        ),
        F.transform(
            F.regexp_extract_all(xml, F.lit(_SM_BLOCK), F.lit(1)),
            lambda b: F.struct(
                F.lit("sitemap").alias("kind"), b.alias("block")
            ),
        ),
    )
    rows = pages.select(
        F.col(url_col).alias("sitemap_url"), F.explode(blocks).alias("e")
    )
    b = F.col("e").getField("block")
    return (
        rows.select(
            "sitemap_url",
            F.col("e").getField("kind").alias("kind"),
            _xml_unescape(_tag(b, "loc")).alias("loc"),
            _blank_null(_tag(b, "lastmod")).alias("lastmod"),
            _blank_null(_tag(b, "changefreq")).alias("changefreq"),
            _blank_null(_tag(b, "priority")).try_cast("double").alias(
                "priority"
            ),
        )
        .filter(F.col("loc") != "")
    )


def sitemap_discoveries(
    sitemap_pages: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    xml_col: str = "html",
) -> DataFrame:
    """Distinct not-yet-crawled page URLs asserted by the sitemaps —
    the frontier's sitemap-sourced candidate set. Same two justified
    shuffles as crawl_frontier's discovery+seen steps: a map-side-
    combined distinct over (loc) (a URL listed by 10^6 sitemap shards
    collapses per partition first), then the LEFT ANTI join against
    the crawled set (AQE broadcasts small recrawl segments; a
    url-bucketed crawled table makes it exchange-free)."""
    locs = (
        sitemap_entries(sitemap_pages, url_col=url_col, xml_col=xml_col)
        .filter(F.col("kind") == "url")
        .select(F.col("loc").alias("url"))
        .distinct()
    )
    return locs.join(
        crawled.select(F.col(crawled.columns[0]).alias("url")),
        "url",
        "left_anti",
    )
