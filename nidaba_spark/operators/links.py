"""Link-graph extraction from raw HTML — the outlink / host-edge
source feeding PageRank domain authority (operators/graphrank.py) and
anchor-text signals.

Spark-first shape: the whole scan is JVM-side codegen — decode →
regexp_extract_all → explode → string-expression URL resolution — so
no Python touches the hot path (plan-asserted in tests/test_links.py)
and Catalyst prunes every column but (url, html) out of the page scan.
At 10^12 pages this is one narrow map stage over the crawl table; only
the optional host-edge aggregation shuffles, and what it shuffles is
(src_host, dst_host) pairs — never page bytes. The host aggregation is
map-side-combined (partial count per partition) so a mega-site's
millions of self-links collapse before the exchange.

Charset handling: the regex scans the ISO-8859-1 decode of the raw
bytes. Latin-1 maps every byte to a char, so the decode can never
throw (relevant under ANSI mode), and every ASCII-compatible charset —
utf-8, latin-1, cp1252, i.e. effectively the whole crawl — preserves
the ASCII bytes href syntax is made of; non-ASCII chars inside a URL
come out mojibake'd but positionally intact. Scanning the latin-1 view
of raw bytes is the standard large-crawl link-graph trick; UTF-16
pages (vanishingly rare) yield no matches rather than errors.

Resolution implements the RFC 3986 cases a link graph needs — absolute
URI, protocol-relative (//host/x), root-relative (/x), and naive
relative-to-base-directory — as pure string expressions. It does NOT
normalize dot-segments ('..') or percent-encoding: both only perturb
intra-site paths and never the host graph, and a byte-exact path
canonicalizer belongs in hoststats.canonicalize if a use case needs
it. javascript:/mailto:/tel:/data: pseudo-links and fragment-only
hrefs are dropped; fragments are stripped before resolution.

Known, accepted false positives of a regex (vs DOM) scanner: HTML
comments are STRIPPED before every scan in this module (a commented
template fragment would otherwise mint false link edges into the
frontier/PageRank and a false canonical could collapse the wrong
pages), but <a> tags inside CDATA or script strings still match.
tests/test_links.py pins the regex path against an html.parser-driven
reference over the synthetic corpus to bound the divergence on
realistic markup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# href value of an <a> tag: double-quoted / single-quoted forms as two
# passes of the same shape (one alternated regex would renumber the
# capture group between engines; two passes keep each pattern trivially
# portable to the RE2-based oracles). `[\s/]` after the tag name keeps
# <article>/<abbr> from matching; `[^>]*?` is lazy so the FIRST href
# attribute in the tag wins, mirroring browser behavior.
# `(?:[^>]*?[\s"'/])?` bounds the attribute NAME: without it the lazy
# [^>]*? expands right up to a name SUFFIX, so data-href / ng-href /
# xlink:href would match as href and emit false edges (review r05).
_ATTR = r"""(?:[^>]*?[\s"'/])?"""
_HREF_DQ = rf"""(?i)<a[\s/]{_ATTR}href\s*=\s*"([^"]*)\""""
_HREF_SQ = rf"(?i)<a[\s/]{_ATTR}href\s*=\s*'([^']*)'"
# href + simple (tag-free) anchor text, captured by ONE regex ran twice
# with different group indexes — identical match sets, so zipping the
# two extract_all arrays pairs them correctly. Anchors with nested
# markup (<a href=x><b>t</b></a>) are out of this view by design.
_HREF_ANCHOR = rf"""(?i)<a[\s/]{_ATTR}href\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>"""

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"
_ORIGIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
_DROP_SCHEMES_RE = r"^(?i)(javascript|mailto|tel|data):"


def html_text(html_col: Column) -> Column:
    """The latin-1 view of raw page bytes (never throws; see module
    docstring for why this is the right view for an href scan)."""
    return F.decode(html_col, "ISO-8859-1")


_COMMENT_RE = r"(?s)<!--.*?-->"


def strip_html_comments(body: Column) -> Column:
    """Drop ``<!-- ... -->`` regions before a byte-regex scan: a
    commented-out template fragment is the classic false positive for
    any tag scanner, and unlike body echoes it is unambiguous to
    remove with one codegen regexp pass. An unterminated ``<!--``
    keeps its tail (browsers comment it out to EOF — the scan stays
    conservative-noisy there, the documented tradeoff)."""
    return F.regexp_replace(body, _COMMENT_RE, "")


def resolve_href(src: Column, href: Column) -> Column:
    """Resolve one href against its source URL; NULL = not an edge
    (empty/fragment-only, pseudo-scheme, or relative with no absolute
    base). Pure string expressions — whole-stage-codegen'd."""
    h = F.trim(href)
    h = F.substring_index(h, "#", 1)  # strip fragment
    scheme = F.regexp_extract(src, _SCHEME_RE, 0)  # 'https:' or ''
    origin = F.regexp_extract(src, _ORIGIN_RE, 0)  # 'https://host' or ''
    src_nofrag = F.regexp_extract(src, r"^[^?#]*", 0)
    basedir = F.regexp_replace(src_nofrag, r"[^/]*$", "")
    basedir = F.when(
        F.length(basedir) <= F.length(origin), F.concat(origin, F.lit("/"))
    ).otherwise(basedir)
    has_base = origin != F.lit("")
    return (
        F.when(h == "", F.lit(None).cast("string"))
        .when(h.rlike(_DROP_SCHEMES_RE), F.lit(None).cast("string"))
        .when(h.rlike(_SCHEME_RE), h)  # already absolute
        .when(h.startswith("//") & has_base, F.concat(scheme, h))
        .when(h.startswith("/") & has_base, F.concat(origin, h))
        .when(has_base, F.concat(basedir, h))
        .otherwise(F.lit(None).cast("string"))
    )


def host_of(url: Column) -> Column:
    """Lower-cased authority host of an absolute URL ('' if none).
    Port, userinfo, path, query are all excluded."""
    return F.lower(
        F.regexp_extract(
            url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
        )
    )


def page_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, href, dst): one row per resolvable <a href> occurrence.

    ``href`` is the raw attribute value (pre-resolution, fragment
    intact) for auditability; ``dst`` is the resolved absolute URL.
    Duplicate links on a page stay duplicated — weighting is the
    consumer's choice (host_edges counts them; a dedup is one
    distinct() away).
    """
    body = strip_html_comments(html_text(F.col(html_col)))
    hrefs = F.concat(
        F.regexp_extract_all(body, F.lit(_HREF_DQ), F.lit(1)),
        F.regexp_extract_all(body, F.lit(_HREF_SQ), F.lit(1)),
    )
    rows = pages.select(
        F.col(url_col).alias("src"), F.explode(hrefs).alias("href")
    )
    return rows.select(
        "src", "href", resolve_href(F.col("src"), F.col("href")).alias("dst")
    ).filter(F.col("dst").isNotNull())


def anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst, anchor): whitespace-collapsed anchor text per
    resolved link, for the double-quoted tag-free-anchor subset (the
    dominant well-formed case; see _HREF_ANCHOR). Anchor-text
    aggregation per dst is then a plain groupBy."""
    body = strip_html_comments(html_text(F.col(html_col)))
    pairs = F.arrays_zip(
        F.regexp_extract_all(body, F.lit(_HREF_ANCHOR), F.lit(1)).alias("href"),
        F.regexp_extract_all(body, F.lit(_HREF_ANCHOR), F.lit(2)).alias("anchor"),
    )
    rows = pages.select(
        F.col(url_col).alias("src"), F.explode(pairs).alias("p")
    ).select(
        "src",
        F.col("p.href").alias("href"),
        F.trim(F.regexp_replace(F.col("p.anchor"), r"\s+", " ")).alias("anchor"),
    )
    return rows.select(
        "src", resolve_href(F.col("src"), F.col("href")).alias("dst"), "anchor"
    ).filter(F.col("dst").isNotNull())


# the second attribute in each pair always has a real boundary char
# before it (at minimum the closing quote of the first value), so its
# name-boundary class is required, not optional — same false-suffix
# rationale as _ATTR (data-rel, data-name, itemprop-content, ...)
_CANON_RH = rf"""(?i)<link[\s]{_ATTR}rel\s*=\s*["']canonical["'][^>]*?[\s"'/]href\s*=\s*["']([^"']*)["']"""
_CANON_HR = rf"""(?i)<link[\s]{_ATTR}href\s*=\s*["']([^"']*)["'][^>]*?[\s"'/]rel\s*=\s*["']canonical["']"""
_ROBOTS_NC = rf"""(?i)<meta[\s]{_ATTR}name\s*=\s*["']robots["'][^>]*?[\s"'/]content\s*=\s*["']([^"']*)["']"""
_ROBOTS_CN = rf"""(?i)<meta[\s]{_ATTR}content\s*=\s*["']([^"']*)["'][^>]*?[\s"'/]name\s*=\s*["']robots["']"""
_TITLE = r"(?i)<title[^>]*>([^<]*)</title>"


def _first_nonempty(body: Column, *patterns: str) -> Column:
    """First capture of the first pattern that matches ('' if none) —
    attribute ORDER varies in the wild (rel before href and after), so
    each meta field scans both orders and takes whichever hit."""
    out = F.lit("")
    for p in reversed(patterns):
        m = F.regexp_extract(body, p, 1)
        out = F.when(m != "", m).otherwise(out)
    return out


def page_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Head-metadata extraction, all whole-stage-codegen: (url, title,
    robots, noindex, nofollow, canonical). ``canonical`` is the
    <link rel=canonical> href RESOLVED against the page url (NULL when
    absent or unresolvable) — the key for canonical-URL dedup.
    ``noindex``/``nofollow`` are token matches inside the robots meta
    content (comma/space separated per the robots spec). One narrow
    map over the crawl table; nothing shuffles."""
    body = strip_html_comments(html_text(F.col(html_col)))
    robots = F.lower(_first_nonempty(body, _ROBOTS_NC, _ROBOTS_CN))
    canon_href = _first_nonempty(body, _CANON_RH, _CANON_HR)
    return pages.select(
        F.col(url_col).alias("url"),
        F.trim(F.regexp_replace(F.regexp_extract(body, _TITLE, 1), r"\s+", " ")).alias(
            "title"
        ),
        robots.alias("robots"),
        robots.rlike(r"(^|[\s,])noindex($|[\s,])").alias("noindex"),
        robots.rlike(r"(^|[\s,])nofollow($|[\s,])").alias("nofollow"),
        F.when(
            canon_href != "", resolve_href(F.col(url_col), canon_href)
        ).alias("canonical"),
    )


def _meta_prop(body: Column, prop: str) -> Column:
    """content of ``<meta property="<prop>" content="...">`` in either
    attribute order ('' when absent) — the page_meta robots/canonical
    pattern applied to OpenGraph-style property metas."""
    pc = (
        rf"""(?i)<meta[\s]{_ATTR}property\s*=\s*["']{prop}["']"""
        rf"""[^>]*?[\s"'/]content\s*=\s*["']([^"']*)["']"""
    )
    cp = (
        rf"""(?i)<meta[\s]{_ATTR}content\s*=\s*["']([^"']*)["']"""
        rf"""[^>]*?[\s"'/]property\s*=\s*["']{prop}["']"""
    )
    return _first_nonempty(body, pc, cp)


def og_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, og_title, og_description, og_type, og_image, og_url) —
    OpenGraph head metadata, the structured self-description social
    cards and search snippets read. Curation uses: og_title as a
    higher-quality title surrogate than <title> on template-heavy
    sites, og:type for document-class priors (article vs product vs
    video), og:image for the multimodal pairing key, og:url as yet
    another canonical signal next to <link rel=canonical> (page_meta)
    and redirect finals (follow_redirects). og_image/og_url are
    RESOLVED against the page url; text fields are
    whitespace-collapsed; absent fields null. Same scale shape as
    page_meta: one narrow whole-stage-codegen scan, zero shuffles."""
    body = strip_html_comments(html_text(F.col(html_col)))
    src = F.col(url_col)

    def txt(prop: str) -> Column:
        v = F.trim(F.regexp_replace(_meta_prop(body, prop), r"\s+", " "))
        return F.when(v != "", v)

    def href(prop: str) -> Column:
        v = _meta_prop(body, prop)
        return F.when(v != "", resolve_href(src, v))

    return pages.select(
        src.alias("url"),
        txt("og:title").alias("og_title"),
        txt("og:description").alias("og_description"),
        txt("og:type").alias("og_type"),
        href("og:image").alias("og_image"),
        href("og:url").alias("og_url"),
    )


def canonical_dedup(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Canonical-URL deduplication — the crawl-hygiene step that
    collapses print/mobile/tracking variants BEFORE any content-level
    dedup spends shuffle bytes on them: group pages by their declared
    canonical target (the page's own url when it declares none), drop
    noindex pages first, keep the lexicographically-min member url.

    Returns (canonical_url, keep_url, n_variants). One map-side-
    combined groupBy on the canonical key; at 10^12 rows the key
    distribution is bounded by the largest canonical cluster (a
    mega-site's tracking-parameter fan-out) — AQE skew-split covers
    it, and the aggregate carries two strings + a count per group."""
    meta = page_meta(pages, url_col, html_col)
    return (
        meta.filter(~F.col("noindex"))
        .select(
            F.coalesce("canonical", "url").alias("canonical_url"), F.col("url")
        )
        .groupBy("canonical_url")
        .agg(
            F.min("url").alias("keep_url"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


def redirect_edges(
    responses: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
) -> DataFrame:
    """(src, dst, status): one alias edge per 3xx capture with a
    resolvable Location (sources/rawfiles.read_warc_responses is the
    input shape). Self-redirects drop (an alias to itself is noise
    that would self-loop the resolver). Pure codegen projection —
    the redirect table is typically 1-5% of a crawl, tiny relative
    to page bytes."""
    s = F.col(status_col)
    return (
        responses.filter(
            (s >= 300) & (s < 400) & F.col(location_col).isNotNull()
        )
        .select(
            F.col(url_col).alias("src"),
            resolve_href(F.col(url_col), F.col(location_col)).alias("dst"),
            s.alias("status"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )


def follow_redirects(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """(src, final): each redirect source mapped to the END of its
    redirect chain — the alias table canonical_dedup / CDX revisit
    logic joins against, so A→B→C collapses to A→C and B→C.

    Pointer jumping, not per-hop walking: each round joins the
    mapping with itself (dst → that dst's own mapping) and advances
    only while the COMBINED hop count stays ≤ max_hops — the budget
    is exact, not rounded up to a power of two (a 7-hop chain under
    max_hops=5 drops; review r05). Resolved length doubles per round
    until the budget or the terminal truncates it, so
    ceil(log2(max_hops))+1 self-join shuffles cover any budget (the
    HTTP-client convention; browsers cap near 20 ≤ 2^5). Each shuffle
    moves the slim (src, dst, hops) alias table only. Cycles (A→B→A)
    burn the budget inside the cycle and are then DROPPED (their
    final is still a redirect source): a redirect loop has no landing
    page, so it must not alias anything. Duplicate-src captures
    (recrawls with different targets) collapse to min(dst) first —
    deterministic regardless of ingest order."""
    m = edges.groupBy("src").agg(F.min("dst").alias("dst")).withColumn(
        "h", F.lit(1)
    )
    for _ in range(max(1, max_hops.bit_length() + 1)):
        nxt = m.select(
            F.col("src").alias("_s"),
            F.col("dst").alias("_d"),
            F.col("h").alias("_h"),
        )
        step_ok = nxt["_d"].isNotNull() & (
            (m["h"] + nxt["_h"]) <= F.lit(max_hops)
        )
        m = (
            m.join(nxt, m["dst"] == nxt["_s"], "left")
            .select(
                "src",
                F.when(step_ok, nxt["_d"]).otherwise(m["dst"]).alias("dst"),
                F.when(step_ok, m["h"] + nxt["_h"]).otherwise(m["h"]).alias(
                    "h"
                ),
            )
        )
    # non-terminal finals are cycle members: their final still has an
    # outgoing alias AND the chain never left the cycle, which after
    # log2 rounds of jumping shows up as final ∈ src-set with
    # final's own final != a fixed point. The simple sound rule:
    # drop rows whose final is still a redirect SOURCE — for a
    # terminal chain the landing page is by construction not 3xx.
    srcs = edges.select(F.col("src").alias("_src")).distinct()
    return (
        m.join(srcs, m["dst"] == srcs["_src"], "left_anti")
        .select("src", F.col("dst").alias("final"))
    )


def page_wat(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """(url, ts_iso, wat_json): the WAT metadata envelope per page,
    built ENTIRELY in whole-stage codegen — regexp extracts for head
    metadata and hrefs, higher-order array transforms for link
    resolution, `to_json` for serialization. One narrow scan of the
    crawl table: no explode, no shuffle, no Python.

    Envelope shape (CC-WAT-like, not byte-compatible — we own both
    ends of the round-trip):

      Envelope.WARC-Header-Metadata: {WARC-Target-URI, WARC-Date,
        WARC-Type: response}
      Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata:
        Head: {Title, Metas: [{name: robots, content}],
               Link: [{rel: canonical, url}]}   (absent fields omitted
               by to_json's null-dropping)
        Links: [{url}] — every resolved <a href> in document order
               (double-quoted matches then single-quoted; same match
               sets as page_links)
        Anchors: [{url, text}] — the tag-free double-quoted-anchor
               subset with whitespace-collapsed text (same view as
               anchor_texts)

    HOF note: resolve_href expands per array element, so the per-row
    scheme/origin sub-expressions re-evaluate per link — regexes over
    the (short) URL, noise next to the body scans; the lambdas never
    re-touch the body, so the HOF quadratic-eval trap (NOTES) does not
    apply."""
    src = F.col(url_col)
    body = strip_html_comments(html_text(F.col(html_col)))
    hrefs = F.concat(
        F.regexp_extract_all(body, F.lit(_HREF_DQ), F.lit(1)),
        F.regexp_extract_all(body, F.lit(_HREF_SQ), F.lit(1)),
    )
    link_objs = F.transform(
        F.filter(
            F.transform(hrefs, lambda h: resolve_href(src, h)),
            lambda u: u.isNotNull(),
        ),
        lambda u: F.struct(u.alias("url")),
    )
    anchor_pairs = F.arrays_zip(
        F.regexp_extract_all(body, F.lit(_HREF_ANCHOR), F.lit(1)).alias("href"),
        F.regexp_extract_all(body, F.lit(_HREF_ANCHOR), F.lit(2)).alias("anchor"),
    )
    anchors = F.filter(
        F.transform(
            anchor_pairs,
            lambda p: F.struct(
                resolve_href(src, p["href"]).alias("url"),
                F.trim(F.regexp_replace(p["anchor"], r"\s+", " ")).alias("text"),
            ),
        ),
        lambda a: a["url"].isNotNull(),
    )
    robots = F.lower(_first_nonempty(body, _ROBOTS_NC, _ROBOTS_CN))
    canon_href = _first_nonempty(body, _CANON_RH, _CANON_HR)
    canonical = F.when(canon_href != "", resolve_href(src, canon_href))
    title = F.trim(
        F.regexp_replace(F.regexp_extract(body, _TITLE, 1), r"\s+", " ")
    )
    head = F.struct(
        title.alias("Title"),
        F.when(
            robots != "",
            F.array(
                F.struct(
                    F.lit("robots").alias("name"), robots.alias("content")
                )
            ),
        ).alias("Metas"),
        F.when(
            canonical.isNotNull(),
            F.array(
                F.struct(
                    F.lit("canonical").alias("rel"), canonical.alias("url")
                )
            ),
        ).alias("Link"),
    )
    ts_iso = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    envelope = F.struct(
        F.struct(
            src.alias("WARC-Target-URI"),
            ts_iso.alias("WARC-Date"),
            F.lit("response").alias("WARC-Type"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                F.struct(
                    head.alias("Head"),
                    link_objs.alias("Links"),
                    anchors.alias("Anchors"),
                ).alias("HTML-Metadata")
            ).alias("HTTP-Response-Metadata")
        ).alias("Payload-Metadata"),
    )
    return pages.select(
        src.alias("url"),
        ts_iso.alias("ts_iso"),
        F.to_json(F.struct(envelope.alias("Envelope"))).alias("wat_json"),
    )


# tracking params stripped by normalize_url: the industry-standard
# junk set (utm_* campaign tags, Google/Facebook click ids, generic
# session ids). Matching is on the PARAM NAME only.
_TRACKER_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|sessionid|phpsessid)(=.*)?$"
_URL_PARTS = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:[^@/?#]*@)?([^/?#]*)([^?#]*)(?:\?([^#]*))?"


def normalize_url(url: Column) -> Column:
    """Canonical dedup key for an absolute http(s)-style URL, pure
    codegen string/array expressions:

      * scheme and host lowercased (path/query case PRESERVED — paths
        are case-sensitive on real servers);
      * userinfo and fragment stripped; default ports (:80 http,
        :443 https) stripped; empty path becomes '/';
      * tracking params (_TRACKER_RE) dropped, survivors SORTED so
        param order can't split a dedup group; '?' dropped when
        nothing survives.

    Dot-segment collapse is intentionally out (same stance as
    resolve_href): it only perturbs intra-site paths, and a wrong
    collapse corrupts keys, while a skipped one merely under-merges.
    Returns NULL for inputs with no scheme://authority. The lambda
    bodies only touch their own element, so the HOF quadratic-eval
    trap does not apply."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _URL_PARTS, 1))
    host = F.lower(F.regexp_extract(u, _URL_PARTS, 2))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(u, _URL_PARTS, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, _URL_PARTS, 4)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(_TRACKER_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), norm)


def host_edges(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — the PageRank input. The count
    aggregates map-side first (hash partial agg), so the exchange
    carries at most |distinct host pairs| rows per partition no matter
    how many links a mega-site emits."""
    hosts = links.select(
        host_of(F.col("src")).alias("src_host"),
        host_of(F.col("dst")).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return hosts.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )
