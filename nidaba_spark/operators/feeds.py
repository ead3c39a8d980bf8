"""RSS/Atom feed ingestion — the fourth leg of the crawl-side
discovery story next to robots (may we fetch?), sitemaps (what does
the site declare?) and the link frontier (what do pages link?): feeds
are how sites announce NEW content with timestamps, so a
freshness-driven crawler merges feed entries into the frontier with
recrawl_priority-style recency weighting.

Both views are pure whole-stage-codegen expressions over the latin-1
byte view (links.html_text), exactly the sitemap pattern: RSS
``<item>`` and Atom ``<entry>`` block arrays are concatenated into a
single explode, so a mixed drop of RSS and Atom files is ONE narrow
map stage — zero shuffles, no Python, feed bytes never leave the
scan. Discovery (``page_feed_links``) is narrower still: no explode
at all for the common zero-or-one-feed page.

Subset implemented (documented, standard-practice bounds):

  * RSS 2.0 ``<item>``: ``<link>`` inner text is the entry URL;
    ``<title>``/``<guid>`` inner text; ``<pubDate>`` kept as the raw
    RFC-822 STRING (feeds mix legal and sloppy date forms — casting
    is the consumer's call, same stance as sitemap lastmod).
  * Atom ``<entry>``: the entry URL is the href of the first
    ``<link>`` whose rel is absent or ``alternate`` (rel="self"/
    "edit"/"enclosure" links skipped, per RFC 4287's default-rel
    rule); ``<title>``/``<id>``; ``<published>`` falling back to
    ``<updated>``.
  * CDATA wrapping and the five predefined XML entities handled in
    values (``&amp;`` last — sitemap._xml_unescape); relative entry
    URLs resolved against the FEED url (Atom xml:base is out of
    scope; feeds that need it are vanishingly rare and resolution
    against the feed URL is the RFC's own fallback).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .links import html_text, resolve_href, strip_html_comments
from .sitemap import _blank_null, _xml_unescape

_ITEM_BLOCK = r"(?is)<item[\s>].*?</item>"
_ENTRY_BLOCK = r"(?is)<entry[\s>].*?</entry>"
_LINK_TAG = r"(?is)<link\b[^>]*>"
_REL_ANY = r"""(?i)[\s"'/]rel\s*=\s*["'][^"']*["']"""
_REL_ALT = r"""(?i)[\s"'/]rel\s*=\s*["']alternate["']"""
_HREF_ATTR = r"""(?i)[\s"'/]href\s*=\s*["']([^"']*)["']"""


def _tag(block: Column, name: str) -> Column:
    """Trimmed inner text of ``<name …attrs…>…</name>`` inside one
    block ('' when absent); optional CDATA wrapper stripped. Unlike
    sitemap's bare-tag extractor, the opening tag may carry
    attributes — the RSS 2.0 spec's own example is
    ``<guid isPermaLink="false">…``, and Atom titles routinely carry
    ``type="html"``; requiring bare tags silently nulls those fields
    on a large fraction of real feeds (review r05)."""
    return F.regexp_extract(
        block,
        rf"(?is)<{name}(?:\s[^>]*)?>\s*(?:<!\[CDATA\[)?\s*(.*?)"
        rf"\s*(?:\]\]>)?\s*</{name}>",
        1,
    )


def _atom_alt_href(block: Column) -> Column:
    """href of the first <link> in an entry whose rel is absent or
    'alternate' ('' when none): RFC 4287 — a link without rel IS
    rel=alternate, and entries list self/edit/enclosure links the
    frontier must not ingest."""
    tags = F.regexp_extract_all(block, F.lit(_LINK_TAG), F.lit(0))
    ok = F.filter(
        tags, lambda t: (~t.rlike(_REL_ANY)) | t.rlike(_REL_ALT)
    )
    first = F.coalesce(F.try_element_at(ok, F.lit(1)), F.lit(""))
    return F.regexp_extract(first, _HREF_ATTR, 1)


def feed_entries(
    pages: DataFrame, url_col: str = "url", xml_col: str = "html"
) -> DataFrame:
    """(feed_url, kind, loc, title, published, guid) — one row per RSS
    ``<item>`` (kind='rss') or Atom ``<entry>`` (kind='atom') across
    every input file, both formats handled in the SAME scan. Blocks
    whose URL is missing or unresolvable drop (a feed entry is its
    link, the sitemap no-loc rule); title/published/guid null when
    absent. ``loc`` is resolved absolute (relative Atom hrefs resolve
    against the feed url). One narrow codegen projection; the only
    width cost is the explode multiplying rows by entries-per-feed,
    which is bounded (~10-100) by feed convention."""
    xml = F.col(xml_col)
    if isinstance(pages.schema[xml_col].dataType, T.BinaryType):
        xml = html_text(xml)
    xml = strip_html_comments(xml)
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(xml, F.lit(_ITEM_BLOCK), F.lit(0)),
            lambda b: F.struct(F.lit("rss").alias("kind"), b.alias("block")),
        ),
        F.transform(
            F.regexp_extract_all(xml, F.lit(_ENTRY_BLOCK), F.lit(0)),
            lambda b: F.struct(F.lit("atom").alias("kind"), b.alias("block")),
        ),
    )
    rows = pages.select(
        F.col(url_col).alias("feed_url"), F.explode(blocks).alias("e")
    )
    b = F.col("e").getField("block")
    kind = F.col("e").getField("kind")
    raw_loc = F.when(kind == "rss", _tag(b, "link")).otherwise(
        _atom_alt_href(b)
    )
    published = F.when(kind == "rss", _tag(b, "pubDate")).otherwise(
        F.when(_tag(b, "published") != "", _tag(b, "published")).otherwise(
            _tag(b, "updated")
        )
    )
    guid = F.when(kind == "rss", _tag(b, "guid")).otherwise(_tag(b, "id"))
    return (
        rows.select(
            "feed_url",
            kind.alias("kind"),
            resolve_href(
                F.col("feed_url"), _xml_unescape(raw_loc)
            ).alias("loc"),
            _blank_null(_xml_unescape(_tag(b, "title"))).alias("title"),
            _blank_null(_xml_unescape(published)).alias("published"),
            _blank_null(_xml_unescape(guid)).alias("guid"),
        )
        .filter(F.col("loc").isNotNull())
    )


_TYPE_FEED = r"""(?i)[\s"'/]type\s*=\s*["']application/(rss|atom)\+xml["']"""


def page_feed_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, feed_url, feed_type) — feed autodiscovery from HTML heads
    (the ``<link rel="alternate" type="application/rss+xml|atom+xml"
    href=…>`` convention): where a crawler LEARNS feed URLs, exactly
    as robots_sitemaps is where it learns sitemap URLs. Attribute
    order free (rel/type/href scanned independently per tag);
    feed_type is 'rss' or 'atom' from the MIME type; href resolved
    against the page. One narrow scan, explode bounded by <link> tags
    per head (a handful)."""
    body = F.col(html_col)
    if isinstance(pages.schema[html_col].dataType, T.BinaryType):
        body = html_text(body)
    tags = F.filter(
        F.regexp_extract_all(
            strip_html_comments(body), F.lit(_LINK_TAG), F.lit(0)
        ),
        lambda t: t.rlike(_REL_ALT) & t.rlike(_TYPE_FEED),
    )
    rows = pages.select(
        F.col(url_col).alias("url"), F.explode(tags).alias("t")
    )
    t = F.col("t")
    return rows.select(
        "url",
        resolve_href(
            F.col("url"),
            _xml_unescape(F.regexp_extract(t, _HREF_ATTR, 1)),
        ).alias("feed_url"),
        F.lower(F.regexp_extract(t, _TYPE_FEED, 1)).alias("feed_type"),
    ).filter(F.col("feed_url").isNotNull())
