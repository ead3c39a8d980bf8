"""Multi-page article reassembly — the extraction-side fix for the
web's pagination habit: long articles ship as N fetches (``?page=2``,
``/p3``) that declare their order via ``<link rel="next"/"prev">``
head tags, and a corpus that treats each fetch as a document trains
on N truncated fragments instead of one coherent text. Three
operators:

  * ``pagination_links`` — the per-page declarations (next/prev
    urls), one narrow codegen scan.
  * ``paginate_chains`` — (url, chain_id, seq): every paginated page
    assigned to its chain (chain_id = the chain head's url) with its
    0-based position, resolved by POINTER DOUBLING — the classic
    parallel list-ranking algorithm: each page starts knowing only
    its predecessor; each round, every page adopts its ancestor's
    ancestor and adds its ancestor's distance, so after ceil(log2(
    max_pages)) rounds every page of a ≤max_pages chain points at
    the head with its exact position. log(n) self-joins of a slim
    (url, ancestor, dist) table — the same doubling trick
    links.follow_redirects uses for redirect chains — instead of a
    sequential walk that cannot be expressed in one Spark job.
  * ``stitch_paginated`` — one row per chain with the pages' texts
    concatenated in reading order (the merge-stage output for
    multi-page articles).

Scale shape: the scan is whole-stage codegen, zero shuffles; chain
resolution shuffles ONLY the slim edge/state table (participants =
paginated pages, a small fraction of any crawl), ceil(log2(
max_pages)) + 3 url-keyed exchanges total; stitching is one
chain-keyed groupBy whose payload is the chain's own text. Page
bytes never enter the doubling loop.

Documented subset + hygiene (pinned in tests/test_pagination.py):
head ``<link>`` declarations only (``<a rel=next>`` body links are a
recall extension a corpus can opt into later); both ``prev`` and
``previous`` accepted; edges to uncrawled targets drop (existence
gate); an in-fork (two pages declaring the same successor) resolves
to the lexicographically-min predecessor, deterministically; an
OUT-fork (two pages naming the same predecessor) is an in-tree —
both branches resolve to the head with equal seq, and stitching
orders equal seqs by text, so output stays deterministic; self-loops
and cycles never resolve to a head and are DROPPED. Chains longer
than the doubling horizon (2^ceil(log2(max_pages)) hops) resolve
their head-side prefix and drop the deeper tail — raise
``max_pages`` if full reassembly of pathological chains matters; the
cost is log.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .links import html_text, resolve_href, strip_html_comments

_LINK_TAG = r"(?is)<link\b[^>]*>"
_REL_NEXT = r"""(?i)[\s"'/]rel\s*=\s*["']next["']"""
_REL_PREV = r"""(?i)[\s"'/]rel\s*=\s*["'](?:prev|previous)["']"""
_HREF = r"""(?i)[\s"'/]href\s*=\s*["']([^"']*)["']"""
# A false pagination edge REWRITES documents (unlike the annotation
# carriers), so the scan region is restricted: HTML comments stripped
# (links.strip_html_comments), then everything from the first <body>
# tag on discarded — honoring the module contract of head
# declarations only. split(limit=2)[0] always matches (whole document
# when no <body>), unlike an extract-with-anchor whose no-match ''
# would silently drop the head.
_BODY_CUT_RE = r"(?i)<body[\s>]"


def pagination_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(url[, *extra_cols], next_url, prev_url) — declared pagination
    neighbors from ``<link rel="next">`` / ``<link rel="prev"|
    "previous">`` head tags, hrefs RESOLVED against the page, null
    when absent or unresolvable. First declaration wins when a page
    repeats one (malformed markup). HTML comments are stripped and
    the scan stops at the first ``<body>`` tag, so a commented-out
    template fragment or a ``<link>`` echoed inside body content
    (code sample, noscript) can never mint an edge that merges
    unrelated pages. ``extra_cols`` ride along untouched (curate's
    recrawl dedup needs warc_ts). One codegen scan, zero shuffles,
    zero Python.
    """
    body = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        body = html_text(body)
    head = F.split(strip_html_comments(body), _BODY_CUT_RE, 2)[0]
    tags = F.regexp_extract_all(head, F.lit(_LINK_TAG), F.lit(0))

    def first_href(rel_pat: str):
        t = F.try_element_at(F.filter(tags, lambda x: x.rlike(rel_pat)), F.lit(1))
        href = F.regexp_extract(t, _HREF, 1)
        return resolve_href(F.col(url_col), href)

    return pages.select(
        F.col(url_col).alias("url"),
        *[F.col(c) for c in extra_cols],
        first_href(_REL_NEXT).alias("next_url"),
        first_href(_REL_PREV).alias("prev_url"),
    )


def paginate_chains(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_pages: int = 64,
) -> DataFrame:
    """(url, chain_id, seq) — every page participating in a resolvable
    pagination chain, with ``chain_id`` = the head page's url and
    ``seq`` its 0-based reading-order position. See the module
    docstring for the pointer-doubling mechanics and the documented
    drop rules (cycles, over-length chains, dead targets).
    """
    links = pagination_links(pages, url_col, html_col)
    crawled = pages.select(F.col(url_col).alias("url"))
    return chains_from_links(links, crawled, max_pages)


def chains_from_links(
    links: DataFrame, crawled: DataFrame, max_pages: int = 64
) -> DataFrame:
    """paginate_chains' resolution half over a pre-computed
    declaration table — the curation-composition seam: when the crawl
    carries recrawls, dedup the slim (url, next_url, prev_url) table
    to one declaration per url FIRST (latest fetch wins) and resolve
    chains against the urls that actually survive extraction, without
    a second pass over page bytes. ``links`` needs columns (url,
    next_url, prev_url); ``crawled`` needs (url), unique."""
    # predecessor edges from BOTH carriers: u's rel=next target v gets
    # predecessor u; v's own rel=prev declaration names it directly.
    from_next = links.filter(F.col("next_url").isNotNull()).select(
        F.col("next_url").alias("url"), F.col("url").alias("ptr")
    )
    from_prev = links.filter(F.col("prev_url").isNotNull()).select(
        "url", F.col("prev_url").alias("ptr")
    )
    edges = from_next.union(from_prev).filter(F.col("url") != F.col("ptr"))
    edges = edges.join(crawled, "url", "left_semi").join(
        crawled.select(F.col("url").alias("ptr")), "ptr", "left_semi"
    )
    # unique predecessor per page: the two carriers normally agree
    # (dedup); a genuine fork resolves to min(ptr), deterministically.
    # Lazy localCheckpoint: the doubling loop below self-joins state,
    # doubling the logical plan per round — without lineage truncation
    # the regexp scan re-executes 2^rounds times and analysis time
    # explodes (same trap as packing's double execution).
    edges = (
        edges.groupBy("url").agg(F.min("ptr").alias("ptr"))
        .localCheckpoint(eager=False)
    )

    # participants = pages on either side of an edge; heads have no
    # predecessor (anc null, dist 0).
    nodes = (
        edges.select("url")
        .union(edges.select(F.col("ptr").alias("url")))
        .distinct()
    )
    state = nodes.join(edges, "url", "left").select(
        "url",
        F.col("ptr").alias("anc"),
        F.when(F.col("ptr").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dist"),
    )
    for _ in range(max(1, math.ceil(math.log2(max(2, max_pages))))):
        b = state.select(
            F.col("url").alias("b_url"),
            F.col("anc").alias("b_anc"),
            F.col("dist").alias("b_dist"),
        )
        state = (
            state.join(b, state["anc"] == b["b_url"], "left")
            .select(
                "url",
                F.coalesce("b_anc", "anc").alias("anc"),
                (F.col("dist") + F.coalesce("b_dist", F.lit(0))).alias("dist"),
            )
            .localCheckpoint(eager=False)  # keep the self-join plan flat
        )
    heads = state.filter(F.col("anc").isNull())
    resolved = state.join(
        heads.select(F.col("url").alias("anc")), "anc", "left_semi"
    )
    return resolved.select(
        "url", F.col("anc").alias("chain_id"), F.col("dist").alias("seq")
    ).union(
        heads.select(
            "url",
            F.col("url").alias("chain_id"),
            F.lit(0).cast("long").alias("seq"),
        )
    )


def ordered_concat(seq, text, sep: str = "\n\n"):
    """AGGREGATE expression: member ``text`` values joined in
    ascending ``seq`` order — THE stitch policy, shared by
    ``stitch_paginated`` and curate's inline stitch so separator,
    null handling (null text skipped by array_join, the member still
    counted), and tie ordering (equal seqs order by text — the
    out-fork/in-tree case) can never diverge between the two."""
    parts = F.array_sort(
        F.collect_list(F.struct(seq.alias("seq"), text.alias("t")))
    )
    return F.array_join(F.transform(parts, lambda s: s["t"]), sep)


def stitch_paginated(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    sep: str = "\n\n",
    max_pages: int = 64,
) -> DataFrame:
    """(chain_id, n_pages, text) — one row per resolved pagination
    chain with the member pages' ``text_col`` joined in reading order
    by ``sep``: the multi-page article reassembled into the single
    document the corpus should carry. Pages outside any chain are
    untouched by design — union them back downstream (they are
    already one-fetch documents).

    One chain-keyed groupBy on top of paginate_chains; the aggregate
    carries (seq, text) structs, array_sort orders them without a
    per-chain window.

    Expects url-unique pages — recrawl-dedup first (curate's
    stitch_pagination path does; a duplicated url would fan out the
    member join and double-count n_pages). A null member text is
    skipped by array_join (the page still counts in n_pages).
    """
    chains = paginate_chains(pages, url_col, html_col, max_pages)
    joined = chains.join(
        pages.select(
            F.col(url_col).alias("url"), F.col(text_col).alias("t")
        ),
        "url",
    )
    return joined.groupBy("chain_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        ordered_concat(F.col("seq"), F.col("t"), sep).alias("text"),
    )
