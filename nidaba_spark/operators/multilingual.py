"""Multilingual page alignment — the crawl-side precursor of
parallel-corpus mining (the WikiMatrix/CCMatrix/ParaCrawl family):
sites that publish translations DECLARE them via ``<link
rel="alternate" hreflang=… href=…>`` head tags (the search-engine
multilingual convention), so cross-language document pairs can be
read straight off the markup instead of guessed by URL pattern or
discovered with an expensive all-pairs embedding comparison. The
alignment stage (sentence-embedding mining) then runs ONLY on these
candidate pairs.

Two operators:

  * ``hreflang_alternates`` — the per-page declaration rows,
    including the convention-required self row and ``x-default``.
  * ``parallel_page_candidates`` — cross-language (url_a, lang_a,
    url_b, lang_b) pairs where BOTH sides were actually crawled and
    (by default) both sides declare EACH OTHER — mutual declaration
    is the precision gate that drops link-rot and one-sided template
    noise.

Scale shape: the declaration scan is one narrow whole-stage-codegen
pass (page bytes never leave the map stage — plan-asserted in
tests/test_multilingual.py); pairing shuffles only the slim
(src, dst, lang) edge table — a url-keyed existence semi-join plus
ONE url-pair-keyed groupBy that folds the two directions together
(no self-join), carrying a few dozen bytes per multilingual page,
never text. At 10^12 pages the edge table is bounded by
(multilingual pages × declared languages), orders of magnitude
smaller than the corpus.

Documented subset: head links only (the sitemap ``xhtml:link``
carrier is a sitemap.py concern); attributes parse in either order
and either quote style; hreflang values are lowercased (BCP-47 is
case-insensitive); HTML comments are STRIPPED before the scan (a
template-wide commented fragment would otherwise mint mutual false
pairs — a data product, not just an annotation); CDATA/body echoes
remain the accepted byte-regex false positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .links import html_text, resolve_href, strip_html_comments

_LINK_TAG = r"(?is)<link\b[^>]*>"
_REL_ALT = r"""(?i)[\s"'/]rel\s*=\s*["']alternate["']"""
_HREFLANG = r"""(?i)[\s"'/]hreflang\s*=\s*["']([^"']*)["']"""
_HREF = r"""(?i)[\s"'/]href\s*=\s*["']([^"']*)["']"""


def hreflang_alternates(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, hreflang, alt_url, is_default) — declared language/region
    alternates from ``<link rel="alternate" hreflang=… href=…>``.

    ``hreflang`` is the lowercased declared tag ('en', 'fr-ca',
    'x-default'); ``is_default`` flags the x-default row (the
    language-selector target, not a translation). ``alt_url`` is
    RESOLVED against the page url; tags with an unresolvable or empty
    href emit no row. The convention requires a SELF row (a page
    lists itself among its alternates) — it is kept here so consumers
    can read the page's own declared language from ``url ==
    alt_url``; pairing drops it.

    One codegen scan + one bounded explode (a page's <link> head
    tags); zero shuffles, zero Python.
    """
    body = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        body = html_text(body)
    tags = F.filter(
        F.regexp_extract_all(
            strip_html_comments(body), F.lit(_LINK_TAG), F.lit(0)
        ),
        lambda t: t.rlike(_REL_ALT) & t.rlike(_HREFLANG),
    )
    rows = pages.select(
        F.col(url_col).alias("url"), F.explode(tags).alias("t")
    )
    t = F.col("t")
    lang = F.lower(F.regexp_extract(t, _HREFLANG, 1))
    href = F.regexp_extract(t, _HREF, 1)
    return (
        rows.select(
            "url",
            F.when(lang != "", lang).alias("hreflang"),
            resolve_href(F.col("url"), href).alias("alt_url"),
        )
        .filter(F.col("hreflang").isNotNull() & F.col("alt_url").isNotNull())
        .withColumn("is_default", F.col("hreflang") == "x-default")
    )


def parallel_page_candidates(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    mutual: bool = True,
) -> DataFrame:
    """(url_a, lang_a, url_b, lang_b) — cross-language document pairs
    for parallel-corpus mining, one row per unordered pair
    (``url_a < url_b`` lexicographically).

    A pair qualifies when page A declares B as a (non-self,
    non-x-default) hreflang alternate, B was actually crawled (the
    existence gate — dead translations drop), and, with
    ``mutual=True`` (default), B declares A back — the standard
    precision gate. Each side's language label comes from the OTHER
    side's markup (the direction publishers actually maintain):
    ``lang_b`` is what A declared for B, ``lang_a`` what B declared
    for A. A side declaring the same partner under several hreflang
    tags (en + en-gb) collapses to the max label — deterministic, and
    downstream alignment only needs the url pair.

    With ``mutual=False`` one-sided declarations survive too (the
    recall-leaning variant for sparse-markup corpora); the undeclared
    direction's lang is null.

    Shuffles touch only the slim edge table: a url-keyed existence
    semi-join, then ONE url-pair-keyed map-side-combined groupBy that
    merges the two directions — no self-join, and page text never
    moves.
    """
    alts = hreflang_alternates(pages, url_col, html_col)
    edges = (
        alts.filter(~F.col("is_default"))
        .filter(F.col("alt_url") != F.col("url"))
        .select(
            F.col("url").alias("src"),
            F.col("alt_url").alias("dst"),
            F.col("hreflang").alias("dst_lang"),
        )
    )
    crawled = pages.select(F.col(url_col).alias("dst"))
    edges = edges.join(crawled, "dst", "left_semi")
    # Fold both directions onto the unordered pair key: the A→B edge
    # contributes the GREATER side's label when dst is the greater
    # url, the lesser side's otherwise; max() merges directions (and
    # multi-label declarations) without a self-join.
    undirected = edges.select(
        F.least("src", "dst").alias("url_a"),
        F.greatest("src", "dst").alias("url_b"),
        F.when(F.col("dst") < F.col("src"), F.col("dst_lang")).alias("lang_a"),
        F.when(F.col("dst") > F.col("src"), F.col("dst_lang")).alias("lang_b"),
    )
    merged = undirected.groupBy("url_a", "url_b").agg(
        F.max("lang_a").alias("lang_a"), F.max("lang_b").alias("lang_b")
    )
    if mutual:
        merged = merged.filter(
            F.col("lang_a").isNotNull() & F.col("lang_b").isNotNull()
        )
    return merged.select("url_a", "lang_a", "url_b", "lang_b")
