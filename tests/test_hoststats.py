"""Host-level curation operators: canonicalization cases, a DuckDB
oracle for host_stats, and the cap's determinism + map-side
WindowGroupLimit plan shape."""

from __future__ import annotations

import contextlib
import io
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark.operators import hoststats  # noqa: E402

URLS = [
    "https://www.Example.COM:8080/path?q=1",
    "http://example.com/",
    "example.com/other",
    "//cdn.example.org/asset.js",
    "ftp://user:pw@Host.Net/x",
    "https://sub.www.example.com/a",
    "https://example.com/a#frag",
    "http://www.example.com/b",
    "https://other.net/a",
    "https://other.net/b",
    "https://other.net/a",  # dup url: n_pages=3, n_urls=2
]

EXPECT = {
    "https://www.Example.COM:8080/path?q=1": "example.com",
    "http://example.com/": "example.com",
    "example.com/other": "example.com",
    "//cdn.example.org/asset.js": "cdn.example.org",
    "ftp://user:pw@Host.Net/x": "host.net",
    "https://sub.www.example.com/a": "sub.www.example.com",
}


def _pages(spark, urls=URLS):
    return spark.createDataFrame(
        [(u, f"body of {u}") for u in urls], ["url", "text"]
    )


def test_canonical_host_cases(spark):
    df = _pages(spark, list(EXPECT)).select(
        "url", hoststats.canonical_host(F.col("url")).alias("host")
    )
    got = {r["url"]: r["host"] for r in df.collect()}
    assert got == EXPECT


def test_host_stats_matches_duckdb(spark):
    got = sorted(
        (r["host"], r["n_pages"], r["n_urls"], r["total_bytes"])
        for r in hoststats.host_stats(_pages(spark), bytes_col="text").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pages AS SELECT * FROM (VALUES "
        + ", ".join(f"('{u}', 'body of {u}')" for u in URLS)
        + ") t(url, text)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT regexp_replace(
                     regexp_extract(lower(trim(url)),
                       '^(?:[a-z][a-z0-9+.-]*:)?(?://)?(?:[^@/?#]*@)?([^:/?#]+)', 1),
                     '^www\\.', '') AS host,
                   count(*) AS n_pages,
                   count(DISTINCT url) AS n_urls,
                   sum(strlen(text)) AS total_bytes
            FROM pages GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want
    stats = dict((h, (p, u)) for h, p, u, _ in got)
    assert stats["other.net"] == (3, 2)


def test_cap_per_host_bounds_and_determinism(spark):
    many = [f"https://big.example.com/p{i}" for i in range(40)] + [
        f"https://small.org/p{i}" for i in range(3)
    ]
    pages = _pages(spark, many)
    capped = hoststats.cap_per_host(pages, 5)
    counts = {
        r["host"]: r["n"]
        for r in capped.groupBy(
            hoststats.canonical_host(F.col("url")).alias("host")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"big.example.com": 5, "small.org": 3}
    kept1 = sorted(r["url"] for r in capped.collect())
    # same kept set regardless of input partitioning
    kept2 = sorted(
        r["url"] for r in hoststats.cap_per_host(pages.repartition(7), 5).collect()
    )
    assert kept1 == kept2
    assert set(kept1) <= set(many)


def test_cap_per_host_plan_uses_window_group_limit(spark):
    capped = hoststats.cap_per_host(_pages(spark), 2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        capped.explain(mode="formatted")
    plan = buf.getvalue()
    # row_number()<=k must push a map-side group limit ahead of the
    # shuffle — the mega-host skew bound the module docstring claims
    assert "WindowGroupLimit" in plan, plan


def test_filter_blocked_semantics(spark):
    from nidaba_spark.operators.hoststats import filter_blocked

    pages = spark.createDataFrame(
        [
            (1, "https://spam.example/a"),  # blocked host
            (2, "https://WWW.SPAM.EXAMPLE:8080/b"),  # same host, www/case/port
            (3, "http://user@spam.example/c"),  # userinfo form
            (4, "https://fine.example/a"),  # survives
            (5, "https://fine.example/ads/banner"),  # pattern drop
            (6, "//cdn.tracker.example/x"),  # protocol-relative, blocked
            (7, "fine.example/ADS/upper"),  # pattern is case-folded
        ],
        "id long, url string",
    )
    kept = filter_blocked(
        pages,
        blocked_hosts=["WWW.Spam.Example", "cdn.tracker.example"],
        url_patterns=[r"/ads/"],
        url_col="url",
    )
    assert {r["id"] for r in kept.collect()} == {4}
    # each knob alone
    only_hosts = filter_blocked(pages, blocked_hosts=["spam.example"])
    assert {r["id"] for r in only_hosts.collect()} == {4, 5, 6, 7}
    only_pat = filter_blocked(pages, url_patterns=[r"/ads/"])
    assert {r["id"] for r in only_pat.collect()} == {1, 2, 3, 4, 6}
    # no knobs = identity
    assert filter_blocked(pages).count() == 7


def test_filter_blocked_broadcasts_the_blocklist(spark):
    import contextlib
    import io

    from nidaba_spark.operators.hoststats import filter_blocked

    pages = spark.createDataFrame(
        [(1, "https://a.example/x")], "id long, url string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filter_blocked(pages, blocked_hosts=["a.example"]).explain(
            mode="formatted"
        )
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the crawl side must not shuffle for the blocklist join
    assert "Exchange hashpartitioning" not in plan


def test_host_quality_stats_are_mergeable(spark):
    """The 100 TB contract: per-segment stats summed == whole-corpus
    stats (mergeable integers — no floats to drift, no rescans)."""
    from pyspark.sql import functions as F

    from nidaba_spark.operators.hoststats import host_quality_stats

    docs = spark.range(0, 400).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"), F.lit(".example/p/"), F.col("id")
        ).alias("url"),
        F.round((F.col("id") % 100) / 100.0, 4).alias("quality"),
    )
    whole = {
        r["host"]: (r["n_docs"], r["sum_quality_micro"], r["n_low"])
        for r in host_quality_stats(docs).collect()
    }
    seg1 = host_quality_stats(docs.filter(F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8")))
    seg2 = host_quality_stats(docs.filter(F.col("url").substr(-1, 1).isin("1", "3", "5", "7", "9")))
    merged = {
        r["host"]: (r["n_docs"], r["sum_quality_micro"], r["n_low"])
        for r in seg1.unionByName(seg2)
        .groupBy("host")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_quality_micro").alias("sum_quality_micro"),
            F.sum("n_low").alias("n_low"),
        )
        .collect()
    }
    assert merged == whole
    assert len(whole) == 7


def test_mine_blocklist_feeds_filter_blocked(spark):
    """The curation loop: pass-N quality stats -> blocklist ->
    pass-N+1 filter_blocked drops exactly the majority-low hosts with
    enough support."""
    from pyspark.sql import functions as F

    from nidaba_spark.operators.hoststats import filter_blocked, mine_blocklist

    # h0: 20 docs, all low -> blocked; h1: 20 docs, all high -> kept;
    # h2: 2 docs, low but under support -> kept
    docs = spark.range(0, 42).select(
        F.concat(
            F.when(F.col("id") < 20, F.lit("https://h0.example/p/"))
            .when(F.col("id") < 40, F.lit("https://h1.example/p/"))
            .otherwise(F.lit("https://h2.example/p/")),
            F.col("id"),
        ).alias("url"),
        F.when(
            (F.col("id") < 20) | (F.col("id") >= 40), F.lit(0.1)
        ).otherwise(F.lit(0.9)).alias("quality"),
    )
    blk = mine_blocklist(docs, min_docs=10, max_low_frac=0.5)
    assert {r["host"] for r in blk.collect()} == {"h0.example"}
    kept = filter_blocked(docs, blocked_hosts=blk)
    hosts = {r["url"].split("/")[2] for r in kept.collect()}
    assert hosts == {"h1.example", "h2.example"}


def test_canonical_host_schemeless_port_and_ipv6(spark):
    # 'example.com:8080/x' used to return '8080' as the host (the
    # bare scheme group matched 'example.com:'), collapsing unrelated
    # sites into shared port-digit host groups; bracketed IPv6
    # literals truncated at the first ':'
    from nidaba_spark.operators.hoststats import canonical_host

    cases = [
        ("https://www.Example.COM/x", "example.com"),
        ("example.com/other", "example.com"),
        ("example.com:8080/other", "example.com"),
        ("//cdn.example.net/lib", "cdn.example.net"),
        ("http://example.com:443/x", "example.com"),
        ("http://[2001:db8::1]/x", "[2001:db8::1]"),
        ("http://user@example.org/x", "example.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["h"] for r in df.select(canonical_host(F.col("url")).alias("h")).collect()
    ]
    assert got == [h for _, h in cases]


def test_filter_blocked_patterns_pass_null_urls(spark):
    # rlike(NULL) is NULL and filter(~NULL) dropped the row — a null
    # url matches no pattern and must pass through, like the
    # blocklist anti-join branch
    from nidaba_spark.operators.hoststats import filter_blocked

    pages = spark.createDataFrame(
        [(1, "https://ok.example/x"), (2, None), (3, "https://bad.example/porn")],
        "id long, url string",
    )
    kept = {
        r["id"] for r in filter_blocked(pages, url_patterns=["porn"]).collect()
    }
    assert kept == {1, 2}
