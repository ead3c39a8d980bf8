"""Link-graph extraction (operators/links.py): resolution-rule units,
an html.parser-driven differential reference over the synthetic corpus
(bounds regex-vs-DOM divergence on realistic markup), plan-shape
assertions (no Python in the scan; map-side partial agg on host
edges), and the pagerank composition."""

from __future__ import annotations

from html.parser import HTMLParser

import pytest
from pyspark.sql import functions as F

from nidaba_spark.functions.charset import decode_bytes
from nidaba_spark.operators.links import (
    anchor_texts,
    host_edges,
    page_links,
    resolve_href,
)

PAGE = (
    '<html><body><nav><a href="/home">home</a> <a href=\'/about\'>ab</a></nav>'
    '<p><a href="https://ref.example.org/cite">cite</a>'
    '<a href="//cdn.example.net/lib.js">cdn</a>'
    '<a href="#top">top</a> <a href="mailto:x@y.com">mail</a>'
    '<a href="../up">up</a> <a href="rel/w1">w</a>'
    '<a href="JAVASCRIPT:void(0)">js</a>'
    '<a class="x" href="/dq2">dq2</a><area href="/not-a"/>'
    "<abbr href='/abbr'>n</abbr></p></body></html>"
)
SRC = "https://docs.example.com/d/7/page.html"


@pytest.fixture(scope="module")
def one_page(spark):
    return spark.createDataFrame(
        [(SRC, bytearray(PAGE.encode("utf-8")))], "url string, html binary"
    )


def test_resolution_rules(spark, one_page):
    got = {
        (r["href"], r["dst"])
        for r in page_links(one_page).collect()
    }
    assert got == {
        ("/home", "https://docs.example.com/home"),
        ("/about", "https://docs.example.com/about"),
        ("https://ref.example.org/cite", "https://ref.example.org/cite"),
        ("//cdn.example.net/lib.js", "https://cdn.example.net/lib.js"),
        ("../up", "https://docs.example.com/d/7/../up"),
        ("rel/w1", "https://docs.example.com/d/7/rel/w1"),
        ("/dq2", "https://docs.example.com/dq2"),
    }  # fragment-only, mailto:, javascript:, <area>, <abbr> all excluded


def test_attribute_name_suffixes_do_not_match(spark):
    """data-href / ng-href / xlink:href are NOT href; data-rel /
    data-name are NOT rel/name (review r05: the lazy [^>]*? must not
    absorb an attribute-name prefix)."""
    from nidaba_spark.operators.links import page_meta

    html = (
        '<a class="x" data-href="/fake1">t</a>'
        '<a ng-href="/fake2">t</a>'
        '<a xlink:href="/fake3">t</a>'
        '<a data-href="/fake4" href="/real">t</a>'
        '<link data-rel="canonical" href="/notcanon">'
        '<meta data-name="robots" content="noindex">'
    )
    df = spark.createDataFrame(
        [(SRC, bytearray(html.encode()))], "url string, html binary"
    )
    links = [(r["href"], r["dst"]) for r in page_links(df).collect()]
    assert links == [("/real", "https://docs.example.com/real")]
    meta = page_meta(df).collect()[0]
    assert meta["canonical"] is None and meta["noindex"] is False


def test_relative_without_absolute_base_drops(spark):
    df = spark.createDataFrame(
        [("not-a-url", bytearray(b'<a href="/x">x</a><a href="http://h/y">y</a>'))],
        "url string, html binary",
    )
    rows = page_links(df).collect()
    assert [(r["href"], r["dst"]) for r in rows] == [("http://h/y", "http://h/y")]


def test_src_with_no_path_gets_slash_basedir(spark):
    df = spark.createDataFrame(
        [("http://host", bytearray(b'<a href="rel">r</a>'))],
        "url string, html binary",
    )
    assert page_links(df).collect()[0]["dst"] == "http://host/rel"


def test_anchor_texts(spark, one_page):
    got = {(r["dst"], r["anchor"]) for r in anchor_texts(one_page).collect()}
    # double-quoted simple anchors only, whitespace collapsed
    assert ("https://docs.example.com/home", "home") in got
    assert ("https://docs.example.com/dq2", "dq2") in got
    assert all(a != "mail" for _, a in got)


def test_host_edges_counts_and_port_userinfo(spark):
    df = spark.createDataFrame(
        [
            ("https://u:p@a.com:8443/x", "https://b.com/1"),
            ("https://a.com/y", "https://b.com:80/2"),
            ("https://a.com/z", "relative-not-absolute"),
        ],
        "src string, dst string",
    )
    rows = {(r["src_host"], r["dst_host"]): r["n_links"] for r in host_edges(df).collect()}
    assert rows == {("a.com", "b.com"): 2}


class _RefCollector(HTMLParser):
    """DOM-driven reference: every <a href> attribute value."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break

    handle_startendtag = handle_starttag


def test_differential_vs_html_parser_on_corpus(spark, corpus_rows):
    """The regex scan must agree with a real parser on realistic
    markup (the synthetic corpus: nav/sidebar/footer boilerplate,
    charset variants, mega-pages). html.parser unescapes entities in
    attribute values; corpus hrefs carry none, so raw-vs-unescaped
    never diverges here — divergence would mean the regex missed or
    invented a link."""
    pages = spark.createDataFrame(
        [(r["url"], bytearray(r["html"])) for r in corpus_rows],
        "url string, html binary",
    )
    got = {
        (r["src"], r["href"])
        for r in pages.select("url", "html")
        .transform(page_links)
        .collect()
    }
    expected = set()
    for r in corpus_rows:
        ref = _RefCollector()
        body, _ = decode_bytes(r["html"])
        try:
            ref.feed(body)
            ref.close()
        except Exception:
            pass
        for h in ref.hrefs:
            clean = h.split("#", 1)[0].strip()
            if not clean or clean.lower().startswith(
                ("javascript:", "mailto:", "tel:", "data:")
            ):
                continue
            expected.add((r["url"], h))
    assert got == expected


def test_plan_is_pure_jvm_and_agg_is_partial(spark, one_page):
    plan = page_links(one_page)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan
    agg_plan = (
        host_edges(page_links(one_page))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in agg_plan or "partial count" in agg_plan.lower()


def test_page_meta_fields_and_attribute_orders(spark):
    from nidaba_spark.operators.links import page_meta

    def page(html):
        return (SRC, bytearray(html.encode("utf-8")))

    df = spark.createDataFrame(
        [
            page(
                "<html><head><title> A \n B </title>"
                '<meta name="robots" content="noindex, nofollow">'
                '<link rel="canonical" href="/canon"></head></html>'
            ),
            page(
                # reversed attribute orders + single quotes
                "<head><meta content='NOFOLLOW' name='robots'>"
                "<link href='https://c.example.com/x' rel='canonical'></head>"
            ),
            page(
                # 'noindexfoo' is NOT a noindex token; no canonical
                '<meta name="robots" content="noindexfoo">'
            ),
        ],
        "url string, html binary",
    )
    rows = page_meta(df).collect()
    assert (rows[0]["title"], rows[0]["noindex"], rows[0]["nofollow"]) == (
        "A B",
        True,
        True,
    )
    assert rows[0]["canonical"] == "https://docs.example.com/canon"
    assert (rows[1]["noindex"], rows[1]["nofollow"]) == (False, True)
    assert rows[1]["canonical"] == "https://c.example.com/x"
    assert (rows[2]["noindex"], rows[2]["canonical"]) == (False, None)


def test_canonical_dedup_groups_and_drops_noindex(spark):
    from nidaba_spark.operators.links import canonical_dedup

    def page(url, head):
        return (url, bytearray(f"<html><head>{head}</head></html>".encode()))

    df = spark.createDataFrame(
        [
            page("https://a.com/1", '<link rel="canonical" href="https://a.com/c">'),
            page("https://a.com/2", '<link rel="canonical" href="https://a.com/c">'),
            page(
                "https://a.com/3",
                '<link rel="canonical" href="https://a.com/c">'
                '<meta name="robots" content="noindex">',
            ),
            page("https://a.com/4", ""),
        ],
        "url string, html binary",
    )
    rows = {r["canonical_url"]: (r["keep_url"], r["n_variants"]) for r in canonical_dedup(df).collect()}
    assert rows == {
        "https://a.com/c": ("https://a.com/1", 2),
        "https://a.com/4": ("https://a.com/4", 1),
    }


def test_normalize_url_rules(spark):
    from nidaba_spark.operators.links import normalize_url

    cases = [
        ("HTTP://A.com:80/X?b=1&a=2#f", "http://a.com/X?a=2&b=1"),
        ("https://a.com:8443/x", "https://a.com:8443/x"),  # non-default port kept
        ("https://u:p@a.com", "https://a.com/"),
        ("https://a.com/p?utm_source=x&fbclid=1", "https://a.com/p"),
        ("https://a.com/p?utm=keepme", "https://a.com/p?utm=keepme"),  # not utm_*
        ("not a url", None),
        ("/relative/only", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["n"] for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert got == [e for _, e in cases]


def test_pagerank_composition(spark, corpus_rows):
    from nidaba_spark.operators.graphrank import pagerank

    pages = spark.createDataFrame(
        [(r["url"], bytearray(r["html"])) for r in corpus_rows[:200]],
        "url string, html binary",
    )
    edges = host_edges(page_links(pages))
    ranks = pagerank(
        edges, iters=5, src="src_host", dst="dst_host", weight="n_links"
    ).collect()
    total = sum(r["rank"] for r in ranks)
    assert ranks and abs(total - 1.0) < 1e-6


def _responses(spark, rows):
    return spark.createDataFrame(
        rows, "url string, status int, location string"
    )


def test_redirect_edges_rules(spark):
    from nidaba_spark.operators.links import redirect_edges

    df = _responses(spark, [
        ("https://r.example/a", 301, "/b"),            # relative resolved
        ("https://r.example/ok", 200, None),           # not a redirect
        ("https://r.example/weird", 200, "/elsewhere"),  # 2xx Location ignored
        ("https://r.example/self", 302, "https://r.example/self"),  # self drop
        ("https://r.example/c", 307, "https://other.example/d"),
        ("https://r.example/nul", 303, None),          # no Location
        ("https://r.example/bad", 301, "mailto:x@y"),  # unresolvable drop
    ])
    got = {(r["src"], r["dst"], r["status"]) for r in redirect_edges(df).collect()}
    assert got == {
        ("https://r.example/a", "https://r.example/b", 301),
        ("https://r.example/c", "https://other.example/d", 307),
    }


def test_follow_redirects_chains_cycles_caps(spark):
    from nidaba_spark.operators.links import follow_redirects

    e = lambda s, d: (f"https://c.example/{s}", f"https://c.example/{d}", 301)
    edges = spark.createDataFrame(
        [
            e("a", "b"), e("b", "c"), e("c", "d"),   # chain a→b→c→d
            e("x", "y"), e("y", "x"),                 # 2-cycle: no landing page
            e("lone", "final"),                        # 1 hop
            # duplicate src from recrawls: deterministic min(dst) chosen
            ("https://c.example/dup", "https://c.example/z2", 301),
            ("https://c.example/dup", "https://c.example/z1", 302),
        ],
        "src string, dst string, status int",
    ).select("src", "dst")
    got = {r["src"]: r["final"] for r in follow_redirects(edges, max_hops=8).collect()}
    assert got == {
        "https://c.example/a": "https://c.example/d",
        "https://c.example/b": "https://c.example/d",
        "https://c.example/c": "https://c.example/d",
        "https://c.example/lone": "https://c.example/final",
        "https://c.example/dup": "https://c.example/z1",
    }  # x and y (cycle members) resolve nowhere and are absent


def test_follow_redirects_hop_budget(spark):
    """A chain longer than max_hops resolves mid-chain onto a redirect
    source and is dropped — the client-gives-up semantics."""
    from nidaba_spark.operators.links import follow_redirects

    n = 12
    edges = spark.createDataFrame(
        [(f"u{i}", f"u{i+1}") for i in range(n)], "src string, dst string"
    )
    got = {r["src"]: r["final"] for r in follow_redirects(edges, max_hops=16).collect()}
    assert got == {f"u{i}": f"u{n}" for i in range(n)}
    # the budget is EXACT for any value, not rounded up to a power of
    # two: only sources within max_hops of the terminal resolve; heads
    # land on redirect sources and drop
    for hops in (4, 5, 1):
        short = follow_redirects(edges, max_hops=hops).collect()
        assert {r["src"] for r in short} == {
            f"u{i}" for i in range(n - hops, n)
        }, hops
