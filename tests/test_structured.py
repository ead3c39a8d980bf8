"""Structured in-page extraction (operators/structured.py): image-text
pair candidates, JSON-LD article metadata, HTML table grids.

Semantics pinned on hand-built HTML (attribute order/quote flips,
decoys, entity + whitespace handling, the documented nested-table
truncation) plus plan-shape assertions: every operator must stay ONE
narrow codegen scan — no Exchange, no Python eval — because at 10^12
pages anything else shuffles page bytes. Full DuckDB oracles for the
three exported queries live in tests/test_offdriver_oracles.py via the
ORACLE registry (arithmetic-reconstructed, independent of the parser).
"""

from __future__ import annotations

import pytest

import datetime

from nidaba_spark.operators.structured import (
    av_candidates,
    html_tables,
    image_candidates,
    image_text_pairs,
    jsonld_article_meta,
    jsonld_blocks,
    page_dates,
    page_lang_declared,
)

HTML = b"""<html><head>
<script type="application/ld+json">{"@type":"BreadcrumbList","itemListElement":[]}</script>
<script type='application/ld+json'>
{"@type":"NewsArticle","headline":"Big  Story","datePublished":"2024-03-15","author":{"name":"Jo Writer"},"description":"d1"}
</script>
<script type="text/javascript">var x={"@type":"NewsArticle"};</script>
</head><body>
<img src="/logo.png" width="32" height="32" alt="logo">
<img alt='A  cat photo' src='img/cat.jpg' width="640" height="480">
<img data-src="/lazy.png" alt="lazy decoy">
<img src="data:image/gif;base64,R0lGOD" alt="pixel">
<IMG SRC="//cdn.example.org/b.jpg" title="Banner  here">
<table class="t"><tr><th>K</th><th>V</th></tr>
<tr><td>name &amp; co</td><td> <b>42</b> </td></tr></table>
<table><tr><td>solo</td></tr></table>
</body></html>"""

PLAIN = b"<html><body>no structure at all</body></html>"


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            ("https://ex.com/a/page.html", bytearray(HTML)),
            ("https://ex.com/b", bytearray(PLAIN)),
        ],
        "url string, html binary",
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- images


def test_image_candidates_semantics(pages):
    rows = {r["img_idx"]: r for r in image_candidates(pages).collect()}
    # data-src decoy (idx 2) and data: pixel (idx 3) emit no rows, but
    # surviving rows keep their true tag positions.
    assert sorted(rows) == [0, 1, 4]
    logo = rows[0]
    assert logo["img_url"] == "https://ex.com/logo.png"  # root-relative
    assert (logo["width"], logo["height"]) == (32, 32)
    cat = rows[1]  # single-quoted, alt-before-src order
    assert cat["img_url"] == "https://ex.com/a/img/cat.jpg"  # dir-relative
    assert cat["alt"] == "A cat photo"  # whitespace collapsed
    banner = rows[4]  # case-insensitive tag/attr, protocol-relative src
    assert banner["img_url"] == "https://cdn.example.org/b.jpg"
    assert banner["alt"] is None and banner["title"] == "Banner here"
    assert banner["width"] is None
    assert all(r["url"] == "https://ex.com/a/page.html" for r in rows.values())


def test_image_text_pairs_cut(pages):
    rows = image_text_pairs(pages, min_alt_chars=5, min_side=64).collect()
    # logo: declared 32x32 -> cut; cat: caption + size ok; banner:
    # title-only caption, no declared size -> passes.
    assert sorted(r["caption"] for r in rows) == ["A cat photo", "Banner here"]


def test_image_plan_is_one_narrow_scan(pages):
    p = _plan(image_candidates(pages))
    assert "Exchange" not in p
    assert "EvalPython" not in p


# ---------------------------------------------------------------- JSON-LD


def test_jsonld_blocks_raw(pages):
    rows = jsonld_blocks(pages).collect()
    assert len(rows) == 2  # text/javascript decoy excluded
    assert rows[0]["block_idx"] == 0
    assert rows[0]["json"].startswith('{"@type":"BreadcrumbList"')
    # pretty-printed block trimmed of surrounding newlines
    assert rows[1]["json"].startswith('{"@type":"NewsArticle"')
    assert rows[1]["json"].endswith("}")


def test_jsonld_article_meta_semantics(pages):
    rows = {r["url"]: r for r in jsonld_article_meta(pages).collect()}
    assert len(rows) == 2  # one row per page, always
    art = rows["https://ex.com/a/page.html"]
    # BreadcrumbList decoy skipped; script-sourced lookalike never parsed
    assert art["ld_type"] == "NewsArticle"
    assert art["headline"] == "Big Story"  # whitespace collapsed
    assert art["date_published"] == "2024-03-15"
    assert art["author"] == "Jo Writer"  # object-form author
    assert art["description"] == "d1"
    empty = rows["https://ex.com/b"]
    assert empty["ld_type"] is None and empty["headline"] is None


def test_jsonld_author_string_form(spark):
    html = (
        b'<script type="application/ld+json">'
        b'{"@type":"Article","headline":"H","author":"Plain Name"}</script>'
    )
    df = spark.createDataFrame(
        [("https://x.com/1", bytearray(html))], "url string, html binary"
    )
    (row,) = jsonld_article_meta(df).collect()
    assert row["author"] == "Plain Name"


def test_jsonld_array_wrapper_documented_null(spark):
    # Top-level JSON arrays are outside the documented subset: the
    # block survives jsonld_blocks but article_meta yields nulls.
    html = (
        b'<script type="application/ld+json">'
        b'[{"@type":"Article","headline":"H"}]</script>'
    )
    df = spark.createDataFrame(
        [("https://x.com/1", bytearray(html))], "url string, html binary"
    )
    (row,) = jsonld_article_meta(df).collect()
    assert row["ld_type"] is None
    assert jsonld_blocks(df).count() == 1


def test_jsonld_plan_is_one_narrow_scan(pages):
    p = _plan(jsonld_article_meta(pages))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_jsonld_author_array_form(spark):
    html = (
        b'<script type="application/ld+json">'
        b'{"@type":"Article","headline":"H",'
        b'"author":[{"name":"First A"},{"name":"Second B"}]}</script>'
    )
    df = spark.createDataFrame(
        [("https://x.com/1", bytearray(html))], "url string, html binary"
    )
    (row,) = jsonld_article_meta(df).collect()
    assert row["author"] == "First A"


# ------------------------------------------------------- av / declared-lang


def test_av_candidates_semantics(spark):
    html = (
        b"<html lang='en-US'><body>"
        b'<video poster="/cover.jpg" width="640">'
        b'<source src="/v.mp4" type="video/MP4">'
        b"<source src='/v.webm' type='video/webm'></video>"
        b'<audio src="snd/a.mp3" title="An  audio clip"></audio>'
        b'<video src="data:video/mp4;base64,xx"></video>'
        b"</body></html>"
    )
    df = spark.createDataFrame(
        [("https://v.com/a/p", bytearray(html))], "url string, html binary"
    )
    rows = {r["media_idx"]: r for r in av_candidates(df).collect()}
    # idx 0: src-less <video> survives VIA its poster; idx 4 (data: src,
    # no poster) drops but holds its slot
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0]["kind"] == "video" and rows[0]["media_url"] is None
    assert rows[0]["poster_url"] == "https://v.com/cover.jpg"
    assert rows[1]["kind"] == "source"
    assert rows[1]["media_url"] == "https://v.com/v.mp4"
    assert rows[1]["mime"] == "video/mp4"  # lowercased
    assert rows[2]["media_url"] == "https://v.com/v.webm"  # single-quoted
    assert rows[3]["kind"] == "audio"
    assert rows[3]["media_url"] == "https://v.com/a/snd/a.mp3"  # dir-relative
    assert rows[3]["caption"] == "An audio clip"  # whitespace collapsed


def test_page_lang_declared_semantics(spark):
    rows = [
        ("https://l.com/a", b'<html lang="en-US"><body>x</body></html>'),
        # bare <html> never matches; og:locale with underscore subtag
        ("https://l.com/b",
         b'<html><meta content="de_DE" property="og:locale"></html>'),
        # multi-value Content-Language: first tag wins
        ("https://l.com/c",
         b'<meta http-equiv="content-language" content="zh-CN, en">'),
        ("https://l.com/d", b"<p>undeclared</p>"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows], "url string, html binary"
    )
    out = {r["url"]: r for r in page_lang_declared(df).collect()}
    assert out["https://l.com/a"]["html_lang"] == "en-US"
    assert out["https://l.com/a"]["lang_declared"] == "en"
    assert out["https://l.com/b"]["html_lang"] is None
    assert out["https://l.com/b"]["lang_declared"] == "de"
    assert out["https://l.com/c"]["lang_declared"] == "zh"
    assert out["https://l.com/d"]["lang_declared"] is None


def test_av_and_lang_plans_no_exchange(pages):
    for df in (av_candidates(pages), page_lang_declared(pages)):
        p = _plan(df)
        assert "Exchange" not in p
        assert "EvalPython" not in p


# ------------------------------------------------------------ page_dates


def test_page_dates_priority_and_fallthrough(spark):
    rows = [
        # 1. JSON-LD beats an OpenGraph decoy
        (
            "https://a.com/x",
            b'<script type="application/ld+json">{"@type":"Article",'
            b'"datePublished":"2024-03-15T10:00:00Z"}</script>'
            b'<meta property="article:published_time" content="2020-01-01">',
        ),
        # 2. OpenGraph full-ISO truncates to a date; a stale <time> loses
        (
            "https://a.com/y",
            b'<meta property="article:published_time" '
            b'content="2023-07-04T08:00:00Z"><time datetime="1999-01-01">o</time>',
        ),
        # 3. an UNPARSEABLE declared value falls through to the URL date
        ("https://a.com/2021/06/15/slug", b'<time datetime="not a date">x</time>'),
        # 4. single-quoted datetime as the FIRST attribute
        ("https://a.com/t", b"<time datetime='2022-11-03'>d</time>"),
        # 5. no carrier at all
        ("https://a.com/none", b"<p>hi</p>"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows], "url string, html binary"
    )
    out = {r["url"]: r for r in page_dates(df).collect()}
    assert out["https://a.com/x"]["date_source"] == "jsonld"
    assert out["https://a.com/x"]["published_date"] == datetime.date(2024, 3, 15)
    assert out["https://a.com/x"]["date_raw"] == "2024-03-15T10:00:00Z"
    assert out["https://a.com/y"]["date_source"] == "og"
    assert out["https://a.com/y"]["published_date"] == datetime.date(2023, 7, 4)
    assert out["https://a.com/2021/06/15/slug"]["date_source"] == "url"
    assert out["https://a.com/2021/06/15/slug"]["published_date"] == datetime.date(
        2021, 6, 15
    )
    assert out["https://a.com/t"]["date_source"] == "time"
    none = out["https://a.com/none"]
    assert none["published_date"] is None and none["date_source"] is None


def test_page_dates_plan_no_exchange(pages):
    p = _plan(page_dates(pages))
    assert "Exchange" not in p
    assert "EvalPython" not in p


# ---------------------------------------------------------------- tables


def test_html_tables_semantics(pages):
    rows = sorted(
        html_tables(pages).collect(),
        key=lambda r: (r["table_idx"], r["row_idx"]),
    )
    assert [(r["table_idx"], r["row_idx"]) for r in rows] == [
        (0, 0),
        (0, 1),
        (1, 0),
    ]
    assert rows[0]["cells"] == ["K", "V"]  # th cells
    # nested tag stripped, entity unescaped, padding collapsed
    assert rows[1]["cells"] == ["name & co", "42"]
    assert rows[1]["n_cells"] == 2
    assert rows[2]["cells"] == ["solo"]


def test_html_tables_nested_flattens_into_parent(spark):
    # Documented subset: the outer table's lazy match ends at the
    # INNER </table> and consumes the inner markup, which flattens
    # into the outer cell's text; the inner table does NOT extract as
    # its own table_idx (matches never overlap).
    html = (
        b"<table><tr><td>outer<table><tr><td>inner</td></tr></table>"
        b"</td></tr></table>"
    )
    df = spark.createDataFrame(
        [("https://x.com/t", bytearray(html))], "url string, html binary"
    )
    rows = html_tables(df).collect()
    assert [r["cells"] for r in rows] == [["outer inner"]]


def test_html_tables_empty_cell_and_no_tables(spark):
    df = spark.createDataFrame(
        [
            ("https://x.com/1", bytearray(b"<table><tr><td></td><td>x</td></tr></table>")),
            ("https://x.com/2", bytearray(b"<p>tableless</p>")),
        ],
        "url string, html binary",
    )
    rows = html_tables(df).collect()
    assert len(rows) == 1
    assert rows[0]["cells"] == ["", "x"]


def test_html_tables_plan_no_exchange(pages):
    p = _plan(html_tables(pages))
    assert "Exchange" not in p
    assert "EvalPython" not in p


# ---------------------------------------------------------------- microdata

MD_HTML = b"""<html><head>
<meta name="viewport" content="width=device-width">
<meta itemprop="datePublished" content="2024-02-14">
<meta content='4.5' itemprop='ratingValue'>
<meta itemprop="sku" content="">
<meta itemprop="price" content=" 19.99  USD ">
</head>
<body data-itemtype="https://schema.org/Fake">
<div itemscope itemtype="https://schema.org/Product">
 <span itemscope itemtype='http://schema.org/Offer'>x</span>
</div>
<div itemscope itemtype=" https://schema.org/Thing/ ">z</div>
</body></html>"""


@pytest.fixture(scope="module")
def md_pages(spark):
    return spark.createDataFrame(
        [
            ("https://ex.com/md", bytearray(MD_HTML)),
            ("https://ex.com/plain", bytearray(PLAIN)),
        ],
        "url string, html binary",
    )


def test_microdata_meta_semantics(md_pages):
    from nidaba_spark.operators.structured import microdata_meta

    rows = {r["meta_idx"]: r for r in microdata_meta(md_pages).collect()}
    # slot 0 (viewport, no itemprop) and slot 3 (sku, empty content)
    # emit no rows but HOLD their positions among all <meta> tags.
    assert sorted(rows) == [1, 2, 4]
    assert rows[1]["itemprop"] == "datePublished"
    assert rows[1]["content"] == "2024-02-14"
    # reversed attribute order + single quotes
    assert rows[2]["itemprop"] == "ratingValue"
    assert rows[2]["content"] == "4.5"
    # internal whitespace collapses, outer trims
    assert rows[4]["itemprop"] == "price"
    assert rows[4]["content"] == "19.99 USD"
    assert all(r["url"] == "https://ex.com/md" for r in rows.values())


def test_microdata_types_semantics(md_pages):
    from nidaba_spark.operators.structured import microdata_types

    rows = sorted(
        microdata_types(md_pages).collect(), key=lambda r: r["item_idx"]
    )
    # data-itemtype decoy must NOT match (left [\s"'/] bound); document
    # order holds across quote styles; trailing slash + padding on the
    # third value exercise trim + md_type segment extraction.
    assert [(r["item_idx"], r["itemtype"], r["md_type"]) for r in rows] == [
        (0, "https://schema.org/Product", "Product"),
        (1, "http://schema.org/Offer", "Offer"),
        (2, "https://schema.org/Thing/", "Thing"),
    ]


def test_microdata_plans_no_exchange(md_pages):
    from nidaba_spark.operators.structured import microdata_meta, microdata_types

    for df in (microdata_meta(md_pages), microdata_types(md_pages)):
        p = _plan(df)
        assert "Exchange" not in p
        assert "EvalPython" not in p
