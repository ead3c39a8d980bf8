"""Structured in-page content extraction from raw HTML — the three
page artifacts next to the link graph (operators/links.py): image-text
pairs, JSON-LD article metadata, and <table> grids.

Curation uses:

  * ``image_candidates`` — the multimodal candidate generator
    (LAION/DataComp shape): every ``<img>`` occurrence with a
    resolvable source URL plus its alt/title text and declared
    dimensions. Join the resolved ``img_url`` against a fetched media
    table (operators/multimodal.py payload columns) and the (alt,
    payload) pairs ARE the image-text training candidates; the
    width/height attributes pre-filter icons and tracking pixels
    before a single byte of image data is fetched.
  * ``jsonld_article_meta`` — schema.org Article metadata from
    ``<script type="application/ld+json">`` blocks: publish/modified
    dates (the freshness signal recrawl_priority can only infer),
    headline (a third title surrogate next to <title> and og:title),
    author. Publisher-declared, so it survives template-heavy pages
    where DOM heuristics drown.
  * ``html_tables`` — table grids as (table_idx, row_idx,
    cells array<string>) rows: structured-data harvesting and a
    table-density page-class signal (a page that is mostly <table> is
    a listing/spec sheet, not prose).

Scale shape shared by all three: ONE narrow whole-stage-codegen scan
over the latin-1 byte view (links.html_text — never throws, preserves
the ASCII bytes markup syntax is made of); regexp_extract_all →
posexplode generators fan rows out without any Exchange, so at 10^12
pages each operator is a single map stage and page bytes never
shuffle (plan-asserted in tests/test_structured.py). No Python
touches any path.

Documented subset (regex-over-bytes, the standard large-crawl trade):

  * image attributes parse in either order and either quote style;
    unquoted attribute values (src=/x.png) are skipped like
    links.py's href scan skips them; width/height keep only plain
    integer values ("640" yes, "640px" no — try_cast, never a throw).
    HTML comments are stripped before every scan in this module
    (links.strip_html_comments — image-text pairs are a training data
    product and page_dates drives freshness DROPS, so a commented
    template fragment must not contribute); CDATA/script-string
    echoes remain the accepted residual. data:/javascript: sources drop via
    links.resolve_href; an <img> with no resolvable src (lazy-load
    data-src patterns) emits no row, but ``img_idx`` still counts it,
    so surviving rows keep their true on-page position.
  * JSON-LD blocks must be top-level JSON OBJECTS (the common emitter
    form); array-wrapped and @graph-wrapped payloads yield nulls —
    extend by exploding ``jsonld_blocks`` and flattening @graph if a
    corpus needs it. ``@type`` matching is exact string match per
    schema.org convention.
  * tables: well-formed (closed) tr/td/th tags; a NESTED table is
    consumed by its parent's (lazy) match — the parent's block ends
    at the INNER close and the inner table's markup flattens into the
    parent's cell text rather than extracting as its own table_idx
    (matches never overlap). Layout-nesting pages are boilerplate,
    not data tables; pin in tests/test_structured.py. Implicitly-
    closed cells (``<td>a<td>b``) don't match; pages from table
    generators (the ones worth harvesting) close their cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .links import html_text, resolve_href, strip_html_comments

_IMG_TAG = r"(?i)<img[\s/][^>]*>"
_LD_BLOCK = (
    r"""(?is)<script[^>]*?type\s*=\s*["']application/ld\+json["'][^>]*>"""
    r"(.*?)</script>"
)
_TABLE_BLOCK = r"(?is)<table(?:[\s/][^>]*)?>(.*?)</table>"
_TR_BLOCK = r"(?is)<tr(?:[\s/][^>]*)?>(.*?)</tr>"
_CELL_BLOCK = r"(?is)<t[dh](?:[\s/][^>]*)?>(.*?)</t[dh]>"

#: schema.org types jsonld_article_meta treats as "an article".
ARTICLE_TYPES = (
    "Article",
    "NewsArticle",
    "BlogPosting",
    "ScholarlyArticle",
    "Report",
    "TechArticle",
)


def _attr(tag: Column, name: str) -> Column:
    """Quoted attribute value inside one tag string (null when absent
    or empty). Two passes — double- then single-quoted — like the
    href scan, so each pattern stays trivially RE2-portable; the
    ``[\\s"'/]`` prefix bounds the attribute NAME (data-src must not
    match src — the links.py r05 review lesson)."""
    dq = F.regexp_extract(tag, rf"""(?i)[\s"'/]{name}\s*=\s*"([^"]*)\"""", 1)
    sq = F.regexp_extract(tag, rf"""(?i)[\s"'/]{name}\s*=\s*'([^']*)'""", 1)
    v = F.when(dq != "", dq).otherwise(sq)
    return F.when(v != "", v)


def _clean_text(c: Column) -> Column:
    """Whitespace-collapsed trimmed text (null when empty)."""
    v = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.when(v != "", v)


def _html_unescape(c: Column) -> Column:
    """The predefined HTML entities table cells actually carry —
    &amp; LAST so &amp;lt; round-trips (the sitemap.py rule)."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def image_candidates(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, img_idx, img_url, alt, title, width, height) — one row
    per ``<img>`` occurrence with a resolvable absolute source URL.

    ``img_idx`` is the tag's 0-based position among ALL <img> tags on
    the page (dropped tags keep their slot — position is a layout
    prior: idx 0 is usually the logo). ``alt``/``title`` are
    whitespace-collapsed (null when absent/empty); ``width``/
    ``height`` are the declared integer attributes (null otherwise).
    One codegen scan + one posexplode generator; zero shuffles.
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(body, F.lit(_IMG_TAG), 0)).alias(
            "img_idx", "tag"
        ),
    )
    t = F.col("tag")
    resolved = tags.select(
        "url",
        "img_idx",
        resolve_href(F.col("url"), _attr(t, "src")).alias("img_url"),
        _clean_text(F.coalesce(_attr(t, "alt"), F.lit(""))).alias("alt"),
        _clean_text(F.coalesce(_attr(t, "title"), F.lit(""))).alias("title"),
        _attr(t, "width").try_cast("int").alias("width"),
        _attr(t, "height").try_cast("int").alias("height"),
    )
    return resolved.where(F.col("img_url").isNotNull())


def image_text_pairs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_alt_chars: int = 5,
    min_side: int = 64,
) -> DataFrame:
    """The curation-grade cut of ``image_candidates``: caption text
    present and long enough to train on, and no DECLARED dimension
    below ``min_side`` (icons/pixels declare tiny sizes; images with
    no declared size pass — the fetch stage re-checks real pixels).
    Same single-scan plan; the filter rides the same projection."""
    c = image_candidates(pages, url_col, html_col)
    caption = F.coalesce(F.col("alt"), F.col("title"))
    return (
        c.where(F.length(caption) >= min_alt_chars)
        .where(
            (F.col("width").isNull() | (F.col("width") >= min_side))
            & (F.col("height").isNull() | (F.col("height") >= min_side))
        )
        .withColumn("caption", caption)
    )


_AV_TAG = r"(?i)<(video|audio|source)[\s/][^>]*>"


def av_candidates(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, media_idx, kind, media_url, mime, poster_url, caption) —
    one row per ``<video>``/``<audio>``/``<source>`` occurrence with a
    resolvable source URL: the audio/video half of the multimodal
    candidate story next to ``image_candidates`` (the fetch stage GETs
    ``media_url``, operators/multimodal.py owns the payload once
    fetched).

    ``kind`` is the lowercased tag name — a ``<source>`` row's parent
    element is outside a regex's reach, so its ``mime`` (the declared
    ``type`` attr, e.g. audio/mpeg vs video/mp4) is the modality
    signal. ``poster_url`` (video only) is the declared cover image —
    itself an image-text candidate. ``caption`` = title or aria-label
    (video/audio carry no alt). ``media_idx`` counts ALL matching tags
    so surviving rows keep their on-page position. A row survives when
    EITHER url resolves: a ``<video poster=…>`` wrapping ``<source>``
    children (the common form) keeps its poster row (media_url null)
    while the children contribute the source rows; a tag with neither
    emits nothing.

    Same scale shape as image_candidates: one codegen scan + one
    posexplode generator, zero shuffles, zero Python (plan-asserted).
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(body, F.lit(_AV_TAG), 0)).alias(
            "media_idx", "tag"
        ),
    )
    t = F.col("tag")
    resolved = tags.select(
        "url",
        "media_idx",
        F.lower(F.regexp_extract(t, r"(?i)^<(video|audio|source)", 1)).alias(
            "kind"
        ),
        resolve_href(F.col("url"), _attr(t, "src")).alias("media_url"),
        F.lower(_attr(t, "type")).alias("mime"),
        resolve_href(F.col("url"), _attr(t, "poster")).alias("poster_url"),
        _clean_text(
            F.coalesce(_attr(t, "title"), _attr(t, "aria-label"), F.lit(""))
        ).alias("caption"),
    )
    return resolved.where(
        F.col("media_url").isNotNull() | F.col("poster_url").isNotNull()
    )


def page_lang_declared(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html_lang, og_locale, content_language, lang_declared) —
    what the page SAYS its language is, from the three declaration
    carriers: the ``<html lang=…>`` attribute, the ``og:locale``
    OpenGraph meta, and the ``Content-Language`` http-equiv meta.
    ``lang_declared`` is the normalized primary subtag (lowercased,
    BCP-47 region/script stripped: en-US → en, zh_CN → zh) of the
    first carrier present, in that trust order.

    Curation use: joined against the DETECTED language (lang_id), a
    declared≠detected mismatch is a strong junk signal — scraped/
    machine-translated spam routinely declares en while the byte
    content is something else — and declared language covers the
    short-text pages n-gram detection is weakest on. One narrow
    codegen scan, zero shuffles, zero Python (plan-asserted).
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    # first <html …> tag's lang attr; _attr's separator rule via the
    # unanchored search inside the extracted tag string
    html_tag = F.regexp_extract(body, r"(?i)<html[\s/][^>]*>", 0)
    html_lang = _attr(html_tag, "lang")
    from .links import _meta_prop

    ogl = _meta_prop(body, "og:locale")
    og_locale = F.when(ogl != "", ogl)
    cl_dq = F.regexp_extract(
        body,
        r"""(?i)<meta[\s/](?:[^>]*?[\s"'/])?http-equiv\s*=\s*["']content-language["']"""
        r"""[^>]*?[\s"'/]content\s*=\s*["']([^"']*)["']""",
        1,
    )
    cl_cd = F.regexp_extract(
        body,
        r"""(?i)<meta[\s/](?:[^>]*?[\s"'/])?content\s*=\s*["']([^"']*)["']"""
        r"""[^>]*?[\s"'/]http-equiv\s*=\s*["']content-language["']""",
        1,
    )
    cl = F.when(cl_dq != "", cl_dq).otherwise(cl_cd)
    content_language = F.when(cl != "", cl)

    def primary(c: Column) -> Column:
        # first comma-separated tag, then primary subtag ('-' or '_')
        one = F.trim(F.substring_index(c, ",", 1))
        return F.lower(F.regexp_extract(one, r"^([A-Za-z]{2,8})", 1))

    declared = primary(F.coalesce(html_lang, og_locale, content_language))
    return pages.select(
        F.col(url_col).alias("url"),
        html_lang.alias("html_lang"),
        og_locale.alias("og_locale"),
        content_language.alias("content_language"),
        F.when(declared != "", declared).alias("lang_declared"),
    )


def jsonld_blocks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, block_idx, json) — raw JSON-LD payload strings, one row
    per ``<script type="application/ld+json">`` block, trimmed. The
    generic consumer surface: downstream picks its own schema."""
    body = strip_html_comments(html_text(F.col(html_col)))
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(body, F.lit(_LD_BLOCK), 1)).alias(
            "block_idx", "json_raw"
        ),
    ).select(
        "url",
        "block_idx",
        # NOT F.trim — Spark's trim strips the space char only, and
        # pretty-printed blocks start/end with newlines.
        F.regexp_replace(F.col("json_raw"), r"^\s+|\s+$", "").alias("json"),
    )


def jsonld_article_meta(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    article_types: tuple[str, ...] = ARTICLE_TYPES,
) -> DataFrame:
    """(url, ld_type, headline, description, date_published,
    date_modified, author) — the FIRST article-typed JSON-LD block per
    page, one row per page (all-null fields when the page declares no
    article). ``author`` handles both schema.org forms: a Person
    object ({"name": ...}) and a bare string.

    Plan: the block array, the article filter, and the first-pick are
    ONE collapsed projection (array HOFs, no explode — a page is one
    row in, one row out); json_tuple parses the chosen block ONCE for
    the five flat fields. Zero shuffles, zero Python.
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    blocks = F.regexp_extract_all(body, F.lit(_LD_BLOCK), 1)
    arts = F.filter(
        blocks,
        lambda b: F.get_json_object(b, "$['@type']").isin(*article_types),
    )
    lded = pages.select(
        F.col(url_col).alias("url"), F.try_element_at(arts, F.lit(1)).alias("ld")
    )
    parsed = lded.select(
        "url",
        F.json_tuple(
            F.col("ld"),
            "@type",
            "headline",
            "description",
            "datePublished",
            "dateModified",
            "author",
        ).alias(
            "ld_type",
            "headline",
            "description",
            "date_published",
            "date_modified",
            "author_raw",
        ),
    )
    author = F.coalesce(
        F.get_json_object(F.col("author_raw"), "$.name"),  # Person object
        F.get_json_object(F.col("author_raw"), "$[0].name"),  # array form
        F.when(
            ~F.col("author_raw").startswith("{")
            & ~F.col("author_raw").startswith("["),
            F.col("author_raw"),  # bare string form
        ),
    )
    return parsed.select(
        "url",
        "ld_type",
        _clean_text(F.coalesce(F.col("headline"), F.lit(""))).alias("headline"),
        _clean_text(F.coalesce(F.col("description"), F.lit(""))).alias(
            "description"
        ),
        F.col("date_published"),
        F.col("date_modified"),
        _clean_text(F.coalesce(author, F.lit(""))).alias("author"),
    )


def page_dates(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    article_types: tuple[str, ...] = ARTICLE_TYPES,
) -> DataFrame:
    """(url, published_date, date_raw, date_source) — the page's
    publish date coalesced from four carriers in trust order:

      1. ``jsonld`` — datePublished of the first article-typed JSON-LD
         block (publisher-declared, machine-intended),
      2. ``og`` — the ``article:published_time`` OpenGraph meta,
      3. ``time`` — the first ``<time datetime=…>`` element,
      4. ``url`` — a ``/YYYY/MM/DD/`` path segment (the blog/news
         permalink convention).

    A declared-but-unparseable value falls THROUGH to the next source
    (a "not a date" time attr can't mask a good URL date); a source
    wins only when its value parses. ``published_date`` is the parsed
    DATE (ISO-8601 / W3C prefix — the only forms these carriers
    legitimately hold); ``date_raw`` is the winning source's raw
    string for auditability. One row per page, nulls when no source
    parses. This is the curation FRESHNESS signal: recency mixing and
    time-sliced corpora need a per-doc date, and crawl timestamps
    (warc_ts) only say when a page was FETCHED, not written.

    Scale shape: one narrow codegen scan, zero shuffles, zero Python
    (plan-asserted in tests/test_structured.py).
    """
    date, raw_win, source = _date_exprs(
        F.col(url_col), strip_html_comments(html_text(F.col(html_col))), article_types
    )
    return pages.select(
        F.col(url_col).alias("url"),
        date.alias("published_date"),
        raw_win.alias("date_raw"),
        source.alias("date_source"),
    )


def published_on_or_after(
    min_date: str,
    url_col: str = "url",
    html_col: str = "html",
    article_types: tuple[str, ...] = ARTICLE_TYPES,
) -> Column:
    """Boolean freshness predicate over raw pages: true when the page
    has NO parseable publish date (undated pages pass — most of the
    web is undated, and absence is not staleness) OR its page_dates
    date is >= ``min_date`` (ISO yyyy-MM-dd). A pure scan-level
    expression, so ``pages.filter(...)`` adds zero shuffles — this is
    the curate(min_published_date=) form."""
    date, _, _ = _date_exprs(
        F.col(url_col), strip_html_comments(html_text(F.col(html_col))), article_types
    )
    return date.isNull() | (date >= F.lit(min_date).cast("date"))


def _date_exprs(
    src: Column, body: Column, article_types: tuple[str, ...] = ARTICLE_TYPES
) -> tuple[Column, Column, Column]:
    """(published_date, winning raw string, source label) column
    expressions — the page_dates core, reusable as a scan predicate."""
    blocks = F.regexp_extract_all(body, F.lit(_LD_BLOCK), 1)
    arts = F.filter(
        blocks,
        lambda b: F.get_json_object(b, "$['@type']").isin(*article_types),
    )
    raw_ld = F.get_json_object(F.try_element_at(arts, F.lit(1)), "$.datePublished")
    # links._meta_prop is the established property-meta extractor
    # (attribute-order-free); '' when absent.
    from .links import _meta_prop

    og = _meta_prop(body, "article:published_time")
    raw_og = F.when(og != "", og)
    # the links.py _ATTR idiom: the separator before the attr NAME is
    # optional-grouped with the prefix, so datetime as the FIRST attr
    # (<time datetime=…>) still matches.
    _tattr = r"""(?:[^>]*?[\s"'/])?"""
    tdq = F.regexp_extract(
        body, rf"""(?i)<time[\s/]{_tattr}datetime\s*=\s*"([^"]*)\"""", 1
    )
    tsq = F.regexp_extract(
        body, rf"""(?i)<time[\s/]{_tattr}datetime\s*=\s*'([^']*)'""", 1
    )
    traw = F.when(tdq != "", tdq).otherwise(tsq)
    raw_time = F.when(traw != "", traw)
    upat = r"/((?:19|20)\d{2})/(\d{2})/(\d{2})(?:/|$)"
    uy = F.regexp_extract(src, upat, 1)
    raw_url = F.when(
        uy != "",
        F.concat_ws(
            "-",
            uy,
            F.regexp_extract(src, upat, 2),
            F.regexp_extract(src, upat, 3),
        ),
    )

    def parse(raw: Column) -> Column:
        return F.substring(raw, 1, 10).try_cast("date")

    cands = [
        ("jsonld", raw_ld),
        ("og", raw_og),
        ("time", raw_time),
        ("url", raw_url),
    ]
    parsed = {name: parse(raw) for name, raw in cands}
    date = F.coalesce(*[parsed[n] for n, _ in cands])
    source = F.coalesce(
        *[F.when(parsed[n].isNotNull(), F.lit(n)) for n, _ in cands]
    )
    raw_win = F.coalesce(
        *[F.when(parsed[n].isNotNull(), raw) for n, raw in cands]
    )
    return date, raw_win, source


def html_tables(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, table_idx, row_idx, cells array<string>, n_cells) — one
    row per <tr> of every <table> on the page, cells in document
    order with tags stripped, entities unescaped, whitespace
    collapsed (empty cell → '').

    Plan: two chained posexplode generators (tables, then rows) — no
    Exchange anywhere, so a 10^12-page scan stays one map stage and a
    mega-page with 10^5 rows fans out inside its own partition. The
    cell transform is computed once per row; n_cells reads the
    materialized array, not a re-parse.
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    tbls = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(body, F.lit(_TABLE_BLOCK), 1)).alias(
            "table_idx", "tbl"
        ),
    )
    rows = tbls.select(
        "url",
        "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("tbl"), F.lit(_TR_BLOCK), 1)
        ).alias("row_idx", "tr"),
    )
    cells = F.transform(
        F.regexp_extract_all(F.col("tr"), F.lit(_CELL_BLOCK), 1),
        lambda c: F.trim(
            F.regexp_replace(
                _html_unescape(F.regexp_replace(c, r"(?is)<[^>]*>", " ")),
                r"\s+",
                " ",
            )
        ),
    )
    with_cells = rows.select("url", "table_idx", "row_idx", cells.alias("cells"))
    return with_cells.select(
        "url",
        "table_idx",
        "row_idx",
        "cells",
        F.size(F.col("cells")).alias("n_cells"),
    )


_META_TAG = r"(?i)<meta[\s/][^>]*>"
# Single pattern covering both quote styles with ONE capture group so
# regexp_extract_all preserves document order across styles (the
# sitemap two-array concat trick would interleave wrong here); a
# mismatched-quote attribute (itemtype="x') is malformed markup and an
# accepted false positive of the [^"'>]* core, same documented-subset
# trade as the href scan.
_ITEMTYPE_VAL = r"""(?i)[\s"'/]itemtype\s*=\s*["']([^"'>]*)["']"""


def microdata_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, meta_idx, itemprop, content) — schema.org **Microdata**
    name/value pairs carried by ``<meta itemprop=… content=…>`` tags:
    the fourth publisher-declared metadata carrier next to OpenGraph
    (links.og_meta), JSON-LD (jsonld_article_meta) and the declared
    language (page_lang_declared). Microdata is what the big
    CMS/e-commerce templates emit inline (ratings, prices, SKUs,
    datePublished on older WordPress themes), so a curation stack that
    reads only JSON-LD misses the long tail of structured metadata.

    ``meta_idx`` is the tag's 0-based position among ALL ``<meta>``
    tags on the page (non-itemprop metas keep their slot — the same
    layout-prior convention as image_candidates.img_idx). ``content``
    is whitespace-collapsed; a tag with itemprop but an absent/empty
    content emits no row (element-body microdata — ``<span
    itemprop=…>text</span>`` — is out of scope for this scan: meta
    carriers hold the machine-intended values). Attributes parse in
    either order and either quote style.

    Scale shape: one narrow whole-stage-codegen scan + one posexplode
    generator; zero shuffles, zero Python, page bytes never leave the
    map stage (plan-asserted in tests/test_structured.py).
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(body, F.lit(_META_TAG), 0)).alias(
            "meta_idx", "tag"
        ),
    )
    t = F.col("tag")
    out = tags.select(
        "url",
        "meta_idx",
        _attr(t, "itemprop").alias("itemprop"),
        _clean_text(F.coalesce(_attr(t, "content"), F.lit(""))).alias(
            "content"
        ),
    )
    return out.where(
        F.col("itemprop").isNotNull() & F.col("content").isNotNull()
    )


def microdata_types(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, item_idx, itemtype, md_type) — schema.org item-type
    declarations (``itemtype`` attributes on itemscope roots), in
    document order. ``md_type`` is the trailing path segment — the
    bare class name ('Product', 'NewsArticle') curation joins and
    filters on, quote-style- and scheme-agnostic (http/https schema.org
    variants collapse); ``itemtype`` keeps the raw declared value for
    auditability. A page-class prior: a page declaring Product/Offer
    items is a listing, not prose, before any text heuristic runs.

    Same documented subset as the href scan: the attribute is matched
    anywhere in the byte stream (comments/CDATA included), bounded on
    the left by a ``[\\s"'/]`` delimiter so data-itemtype never
    matches. Single codegen scan + posexplode; zero shuffles.
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    vals = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(body, F.lit(_ITEMTYPE_VAL), 1)
        ).alias("item_idx", "itemtype"),
    )
    raw = F.trim(F.col("itemtype"))
    md = F.regexp_extract(raw, r"([^/#]+)/?$", 1)
    return vals.select(
        "url",
        "item_idx",
        F.when(raw != "", raw).alias("itemtype"),
        F.when(md != "", md).alias("md_type"),
    )
