"""Multilingual alignment (operators/multilingual.py): hreflang
alternate extraction + mutual cross-language pair mining.

Semantics pinned on hand-built heads (attribute order/quote flips,
uppercase hreflang, x-default, decoys, relative href resolution,
one-sided vs mutual declarations); plan shape: the declaration scan
must stay one narrow codegen pass (no Exchange, no Python). The full
DuckDB oracles for the two exported queries run in
tests/test_offdriver_oracles.py via the ORACLE registry.
"""

from __future__ import annotations

import pytest

from nidaba_spark.operators.multilingual import (
    hreflang_alternates,
    parallel_page_candidates,
)

EN = b"""<html><head>
<link rel="stylesheet" href="/style.css">
<link rel="alternate" type="application/rss+xml" href="/feed.xml">
<link rel="alternate" hreflang="en" href="https://ex.com/en/p">
<link hreflang='FR-ca' rel='alternate' href='/fr/p'>
<link rel="alternate" hreflang="es" href="/es/p">
<link rel="alternate" hreflang="de" href="/de/p">
<link rel="alternate" hreflang="x-default" href="/en/p">
</head><body>hello</body></html>"""

# mutual with EN; relative href resolves against THIS page's url
FR = b"""<html><head>
<link rel="alternate" hreflang="en" href="/en/p">
<link rel="alternate" hreflang="fr-ca" href="/fr/p">
</head><body>bonjour</body></html>"""

# exists but declares nothing back — one-sided target
ES = b"<html><head></head><body>hola</body></html>"


@pytest.fixture(scope="module")
def ml_pages(spark):
    return spark.createDataFrame(
        [
            ("https://ex.com/en/p", bytearray(EN)),
            ("https://ex.com/fr/p", bytearray(FR)),
            ("https://ex.com/es/p", bytearray(ES)),
        ],
        "url string, html binary",
    )


def test_hreflang_alternates_semantics(ml_pages):
    rows = hreflang_alternates(ml_pages).collect()
    en_rows = sorted(
        ((r["hreflang"], r["alt_url"], r["is_default"]) for r in rows
         if r["url"] == "https://ex.com/en/p")
    )
    # stylesheet + hreflang-less feed decoys excluded; uppercase
    # lowercased; relative hrefs resolved; x-default flagged.
    assert en_rows == [
        ("de", "https://ex.com/de/p", False),
        ("en", "https://ex.com/en/p", False),
        ("es", "https://ex.com/es/p", False),
        ("fr-ca", "https://ex.com/fr/p", False),
        ("x-default", "https://ex.com/en/p", True),
    ]
    assert sum(r["url"] == "https://ex.com/es/p" for r in rows) == 0


def test_parallel_pages_mutual(ml_pages):
    rows = parallel_page_candidates(ml_pages).collect()
    # de never crawled (existence gate), es never declares back
    # (mutuality gate) — only en↔fr survives, labels from the
    # OPPOSITE side's markup, lowercased.
    assert [(r["url_a"], r["lang_a"], r["url_b"], r["lang_b"]) for r in rows] == [
        ("https://ex.com/en/p", "en", "https://ex.com/fr/p", "fr-ca")
    ]


def test_parallel_pages_non_mutual_keeps_one_sided(ml_pages):
    rows = {
        (r["url_a"], r["url_b"]): (r["lang_a"], r["lang_b"])
        for r in parallel_page_candidates(ml_pages, mutual=False).collect()
    }
    # the one-sided en→es edge survives with the undeclared direction
    # null; the dead de target still drops (existence is not optional)
    assert rows == {
        ("https://ex.com/en/p", "https://ex.com/fr/p"): ("en", "fr-ca"),
        ("https://ex.com/en/p", "https://ex.com/es/p"): (None, "es"),
    }


def test_self_and_default_rows_never_pair(spark):
    # a page declaring ONLY itself + x-default yields no candidates
    html = (b'<html><head>'
            b'<link rel="alternate" hreflang="en" href="/only">'
            b'<link rel="alternate" hreflang="x-default" href="/only">'
            b'</head><body></body></html>')
    df = spark.createDataFrame(
        [("https://ex.com/only", bytearray(html))], "url string, html binary"
    )
    assert parallel_page_candidates(df, mutual=False).count() == 0


def test_alternates_plan_no_exchange(ml_pages):
    p = (
        hreflang_alternates(ml_pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p
    assert "EvalPython" not in p
