"""Host-level crawl curation: URL canonicalization, per-host stats,
and deterministic per-host document capping.

Web-scale corpora are curated per HOST as much as per document
(RefinedWeb §3.1 URL filtering; Gopher's domain mixing): a handful of
mega-hosts contribute a wildly disproportionate share of pages, and
both blocklist decisions and diversity caps key on the registrable
host. Three operators, all pure DataFrame transforms:

* ``canonical_host`` — codegen regexp canonicalization (scheme,
  userinfo, port, path stripped; lowercased; leading ``www.``
  dropped). No UDF: one regexp_extract + one regexp_replace.
* ``host_stats`` — one hash aggregation keyed on the canonical host
  (map-side partial agg; the shuffle carries one row per host per
  map task, not per page).
* ``cap_per_host`` — keep a deterministic hash-ordered sample of at
  most ``max_docs`` pages per host via ``row_number() <= k``. Spark
  rewrites that filter into a WindowGroupLimit (asserted in
  tests/test_hoststats.py): every map task locally truncates each
  host group to k rows BEFORE the shuffle, so a 10^9-page mega-host
  contributes at most k rows per upstream partition to the sort —
  the skew exposure is k × n_map_partitions, not the host's row
  count. Ordering by xxhash64(url) (url tiebreak) makes the kept
  set a uniform, input-partitioning-independent sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# host = the authority component up to the first ':' (port), '/', '?'
# or '#', after an optional scheme and userinfo. Accepts scheme-less
# and protocol-relative ('//host/x') urls. The scheme is only
# stripped when FOLLOWED BY '//': the old bare '[a-z][...]*:' scheme
# group also matched 'example.com:' in the scheme-less-with-port
# form, so every such page got the PORT DIGITS as its host —
# unrelated sites collapsed into shared '8080'/'443' host groups for
# capping/stats/blocklists (review r05). A bracketed IPv6 literal is
# captured whole instead of truncating at its first ':'.
_HOST_RE = r"^(?:[a-z][a-z0-9+.-]*://|//)?(?:[^@/?#]*@)?(\[[^\]]*\]|[^:/?#]+)"


def canonical_host(url: Column) -> Column:
    """Lower-cased registrable host with ``www.`` stripped."""
    h = F.regexp_extract(F.lower(F.trim(url)), _HOST_RE, 1)
    return F.regexp_replace(h, r"^www\.", "")


def host_stats(pages: DataFrame, url_col: str = "url", bytes_col: str | None = None) -> DataFrame:
    """Per-host corpus accounting: page count, distinct urls, and
    (optionally) total payload bytes — the table host blocklists and
    mixing weights are derived from."""
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct(F.col(url_col)).alias("n_urls"),
    ]
    if bytes_col is not None:
        aggs.append(
            F.coalesce(F.sum(F.octet_length(F.col(bytes_col))), F.lit(0)).alias(
                "total_bytes"
            )
        )
    return pages.groupBy(canonical_host(F.col(url_col)).alias("host")).agg(*aggs)


def cap_per_host(pages: DataFrame, max_docs: int, url_col: str = "url") -> DataFrame:
    """At most ``max_docs`` pages per canonical host, chosen by url
    hash order (deterministic, partitioning-independent)."""
    w = Window.partitionBy(canonical_host(F.col(url_col))).orderBy(
        F.xxhash64(F.col(url_col)), F.col(url_col)
    )
    return (
        pages.withColumn("_host_rn", F.row_number().over(w))
        .filter(F.col("_host_rn") <= F.lit(max_docs))
        .drop("_host_rn")
    )


def filter_blocked(
    pages: DataFrame,
    blocked_hosts: DataFrame | list[str] | None = None,
    url_patterns: list[str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """URL filtering (RefinedWeb §3.1 / C4-style blocklisting): drop
    pages whose CANONICAL host is on a blocklist and/or whose full url
    matches any of the given regex patterns (adult/ads/tracker path
    rules and the like).

    ``blocked_hosts`` is a one-column DataFrame (``host``) or a list
    of host strings; both sides are canonicalized (lowercase,
    ``www.`` stripped) so ``WWW.Spam.example`` blocks
    ``spam.example/…``. ``url_patterns`` are Java-regex ∩ RE2
    (oracle-portable) and are OR-folded into ONE ``rlike`` over the
    lowercased url — a pure scan predicate.

    Scale shape: the blocklist joins as a BROADCAST anti-join — real
    blocklists (e.g. the UT1 categories RefinedWeb uses) are 10^5-10^7
    hosts, tens of MB, comfortably under the broadcast ceiling, and
    the crawl side keeps ZERO extra shuffles. If a blocklist ever
    outgrows broadcast, drop the hint and let AQE pick the shuffle
    join; the operator's semantics don't change. The pattern drop
    adds no join at all.
    """
    out = pages
    if url_patterns:
        combined = "(" + ")|(".join(url_patterns) + ")"
        # NULL url passes through (matches no pattern), like the
        # blocklist anti-join branch — filter(~NULL) is NULL and would
        # silently drop such rows only when patterns are enabled
        out = out.filter(
            F.col(url_col).isNull()
            | ~F.lower(F.col(url_col)).rlike(combined)
        )
    if blocked_hosts is not None:
        if not isinstance(blocked_hosts, DataFrame):
            blocked_hosts = (
                out.sparkSession.createDataFrame(
                    [(h,) for h in blocked_hosts], "host string"
                )
                if blocked_hosts
                else None
            )
        if blocked_hosts is not None:
            blk = blocked_hosts.select(
                F.regexp_replace(
                    F.lower(F.trim(F.col("host"))), r"^www\.", ""
                ).alias("_blkhost")
            ).distinct()
            out = (
                out.withColumn("_chost", canonical_host(F.col(url_col)))
                .join(
                    F.broadcast(blk),
                    F.col("_chost") == F.col("_blkhost"),
                    "left_anti",
                )
                .drop("_chost")
            )
    return out


def host_quality_stats(
    docs: DataFrame,
    url_col: str = "url",
    quality_col: str = "quality",
    low_threshold: float = 0.5,
) -> DataFrame:
    """Blocklist MINING: per-canonical-host quality accounting, the
    table `filter_blocked` blocklists are derived from (the curation
    loop closed from the crawl's own signals, like the PageRank
    authority prior).

    Returns (host, n_docs, sum_quality_micro, n_low) — one hash
    aggregation keyed on the canonical host, map-side combined, the
    shuffle carrying one row per host per map task. The stats are
    MERGEABLE INTEGERS by design (quality folded to round(q·1e6),
    the dsir/lm micro idiom): per-crawl-segment stats roll up by
    plain summation forever — no floats to drift, no rescans — and
    avg quality is sum_quality_micro / 1e6 / n_docs at read time.
    Candidate blocklist = hosts with n_docs >= support AND
    n_low/n_docs above the caller's cut.
    """
    q = F.col(quality_col)
    return docs.groupBy(canonical_host(F.col(url_col)).alias("host")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(q * 1e6).cast("long")).alias("sum_quality_micro"),
        F.sum((q < F.lit(low_threshold)).cast("long")).alias("n_low"),
    )


def mine_blocklist(
    scored_docs: DataFrame,
    url_col: str = "url",
    quality_col: str = "quality",
    low_threshold: float = 0.5,
    min_docs: int = 100,
    max_low_frac: float = 0.5,
) -> DataFrame:
    """Derive a host blocklist FROM the crawl's own quality signal:
    hosts with >= ``min_docs`` scored documents of which more than
    ``max_low_frac`` fall under the quality floor. Returns a
    one-column (host) DataFrame that feeds ``filter_blocked`` on the
    NEXT crawl/segment directly.

    Two-pass by design (like the PageRank authority prior): scoring
    pass N's corpus mines the blocklist that pass N+1 applies before
    parsing — the in-pass alternative would gate a page's survival on
    an aggregate over the very corpus being built. host_quality_stats'
    mergeable-integer output means pass-N stats can also accumulate
    across segments and the blocklist re-derives from the rollup with
    no rescans.
    """
    stats = host_quality_stats(
        scored_docs, url_col=url_col, quality_col=quality_col,
        low_threshold=low_threshold,
    )
    return stats.filter(
        (F.col("n_docs") >= F.lit(min_docs))
        & (F.col("n_low") / F.col("n_docs") > F.lit(max_low_frac))
    ).select("host")
