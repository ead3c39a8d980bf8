"""robots.txt parsing + honor filtering — the crawl-politeness gate a
Common-Crawl-style curation pipeline applies before keeping a page
(CC itself ships per-crawl robotstxt WARC segments for exactly this).

Semantics: the practical subset of RFC 9309 every major parser agrees
on, as pure DataFrame expressions —

  * lines are ``field: value`` with case-insensitive field names,
    ``#``-to-EOL comments stripped, CRLF tolerated;
  * consecutive ``User-agent`` lines form ONE group header; the
    Allow/Disallow lines that follow belong to that group until the
    next header starts;
  * group selection: all groups naming our product token exactly
    (case-insensitive) if any exist, else all ``*`` groups, else no
    rules (everything allowed) — specific-beats-wildcard, and groups
    at the chosen specificity MERGE per RFC 9309 §2.2.1;
  * matching: longest-path-prefix rule wins; Allow beats Disallow on
    a length tie; no matching rule means allowed; an empty
    ``Disallow:`` value is a no-op line.

Documented deviations (kept deliberately narrow): ``*``/``$``
wildcard rules are DROPPED rather than matched (a conservative
choice would instead treat a dropped Disallow as allow — callers who
need wildcard fidelity own that policy), and paths are compared as
raw strings (no %-decoding normalization).

Scale shape at 10^9 hosts: parsing windows/aggregations are keyed by
host and bounded by RFC 9309's 500 KiB file cap; the effective rules
collapse to ONE array row per host (KB-scale), so the page-side honor
check is a BROADCAST join by default (zero page-side shuffle; see
robots_filter.broadcast_rules for the planetary-host fallback) plus a
zero-shuffle higher-order expression over the bound rules array —
page bytes never enter any exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .links import host_of

# field name, tolerant of surrounding blanks; value = rest of line
_FIELD_RE = r"^\s*([A-Za-z-]+)\s*:"
_VALUE_RE = r"^\s*[A-Za-z-]+\s*:\s*(.*?)\s*$"


def _robots_fields(
    robots: DataFrame, host_col: str, txt_col: str
) -> DataFrame:
    """(host, pos, field, value) per parsed robots.txt line — the
    shared front half of robots_rules and robots_sitemaps: the
    deterministic one-file-per-host representative (min xxhash64 —
    interleaving two snapshots' lines through one window would fuse
    their groups into garbage), BOM strip, CRLF/comment tolerance,
    line split, case-folded field names."""
    one_per_host = (
        robots.select(
            F.lower(F.trim(F.col(host_col))).alias("host"),
            F.col(txt_col).alias("_txt"),
        )
        .withColumn("_hk", F.xxhash64("_txt"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("host").orderBy("_hk", "_txt")
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    lines = one_per_host.select(
        "host",
        F.posexplode(
            F.split(
                F.regexp_replace(
                    F.regexp_replace(
                        # decoded U+FEFF BOM or its latin-1
                        # mojibake (this repo decodes crawl
                        # bytes as ISO-8859-1): either form
                        # would kill the first directive and
                        # orphan the whole group (review r05)
                        F.col("_txt"),
                        "^(?:\ufeff|\u00ef\u00bb\u00bf)",
                        "",
                    ), "\r", ""
                ),
                "\n",
            )
        ).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )
    return lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _FIELD_RE, 1)).alias("field"),
        F.regexp_extract("line", _VALUE_RE, 1).alias("value"),
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, sitemap_url): every ``Sitemap:`` directive per host —
    the discovery channel for operators/sitemap.sitemap_entries. The
    directive is GROUP-INDEPENDENT per the sitemaps.org protocol (it
    applies whatever User-agent group it sits inside), so no group
    bookkeeping applies; values keep their case (URLs), relative
    values are dropped (the protocol requires a full URL), and
    duplicates within one file collapse. Same host-keyed, 500 KiB-
    bounded parse shape as robots_rules."""
    return (
        _robots_fields(robots, host_col, txt_col)
        .filter(
            (F.col("field") == "sitemap")
            & F.col("value").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
        )
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, rules: array<struct<path,allow>>) — the effective rule
    set for ``agent`` per host, ready to broadcast-or-join against a
    page table. Hosts whose file yields no applicable rules emit no
    row (absent == everything allowed, the RFC default).

    Input contract: at most one robots_txt per host is meaningful; if
    several rows share a host (e.g. two crawl snapshots), a
    DETERMINISTIC representative (min xxhash64 of the text) is used —
    interleaving two files' lines through one window would fuse their
    groups into garbage. Pre-dedup upstream (latest-wins) if you need
    snapshot semantics. Hosts are compared lowercased (matching
    links.host_of's page side) and a leading UTF-8 BOM — common in
    real crawls — is stripped before line parsing."""
    parsed = _robots_fields(robots, host_col, txt_col).filter(
        F.col("field").isin("user-agent", "allow", "disallow")
    )

    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumn(
        "_starts",
        (
            (F.col("field") == "user-agent")
            & (F.coalesce(F.lag("field").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn(
        "group_id",
        F.sum("_starts").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

    agents = (
        grouped.filter(F.col("field") == "user-agent")
        .groupBy("host", "group_id")
        .agg(F.collect_set(F.lower(F.col("value"))).alias("agents"))
        .withColumn(
            "rank",
            F.when(F.array_contains("agents", agent.lower()), F.lit(0))
            .when(F.array_contains("agents", "*"), F.lit(1))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("rank").isNotNull())
    )
    chosen = agents.groupBy("host").agg(F.min("rank").alias("rank"))
    eff_groups = agents.join(chosen, ["host", "rank"]).select("host", "group_id")

    rules = grouped.filter(
        F.col("field").isin("allow", "disallow")
        & (F.col("value") != "")  # 'Disallow:' (empty) is a no-op line
        & ~F.col("value").rlike(r"[*$]")  # wildcard rules dropped (doc'd)
    ).select(
        "host",
        "group_id",
        F.col("value").alias("path"),
        (F.col("field") == "allow").alias("allow"),
    )
    return (
        rules.join(eff_groups, ["host", "group_id"])
        .groupBy("host")
        .agg(F.collect_list(F.struct("path", "allow")).alias("rules"))
    )


def url_path(url: Column) -> Column:
    """Path+query of an absolute URL ('/' when the URL has none).
    Scheme match is case-insensitive, like links.host_of — otherwise
    an uppercase-scheme URL would bind its host's rules but evaluate
    with path '/'. The authority stops at '/', '?' or '#': the old
    ``[^/]+`` swallowed a no-path query ('https://h?id=1' evaluated
    as '/', escaping 'Disallow: /?sessionid=' rules) and misread a
    query containing '/' as the path (review r05). A query with no
    path gets the RFC 9309 effective form '/?...'."""
    p = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([/?].*)?$", 1
    )
    return (
        F.when(p == "", F.lit("/"))
        .when(p.startswith("?"), F.concat(F.lit("/"), p))
        .otherwise(p)
    )


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
    broadcast_rules: bool = True,
) -> DataFrame:
    """pages + ``robots_allowed`` boolean (longest-match honor check).

    The decision is one higher-order expression over the host's bound
    rules array: filter to prefix-matching rules, take the max of
    struct(path_length, allow) — struct ordering gives longest-match
    with Allow winning length ties — null/empty means allowed.

    ``broadcast_rules`` (default True) broadcasts the effective-rules
    table so the PAGE side pays ZERO shuffle — right whenever the
    rule-bearing host universe fits an executor (one array row per
    host; tens of millions of hosts is tens–hundreds of MB). Set
    False for a planetary host table and the join falls back to a
    host-keyed shuffle (AQE handles mega-host skew) — the pages still
    never carry their payload columns into any extra exchange.
    """
    eff = robots_rules(robots, agent, host_col=host_col, txt_col=txt_col).select(
        # avoid colliding with any 'host'/'rules' column the page
        # table already carries
        F.col("host").alias("_rrhost"),
        F.col("rules").alias("_rrules"),
    )
    if broadcast_rules:
        eff = F.broadcast(eff)
    # project path/host FIRST: HOF lambdas are interpreted, so they
    # must slice bound attributes, never re-evaluate an extract per
    # element (the _ngrams O(n²) trap)
    keyed = pages.withColumn("_rhost", host_of(F.col(url_col))).withColumn(
        "_rpath", url_path(F.col(url_col))
    )
    joined = keyed.join(eff, keyed["_rhost"] == eff["_rrhost"], "left")
    best = F.array_max(
        F.transform(
            F.filter(
                F.col("_rrules"),
                lambda r: F.col("_rpath").startswith(r["path"]),
            ),
            lambda r: F.struct(
                F.length(r["path"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return (
        joined.withColumn(
            "robots_allowed",
            F.when(F.col("_rrules").isNull(), F.lit(True)).otherwise(
                F.coalesce(best["a"] == 1, F.lit(True))
            ),
        )
        .drop("_rrhost", "_rrules", "_rhost", "_rpath")
    )
