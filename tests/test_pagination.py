"""Pins the documented subset + hygiene of operators/pagination.py:
head <link rel=next/prev> carriers only (no <a> body links), both
'prev' and 'previous' spellings, first-declaration-wins on repeats,
href resolution, existence gate, deterministic fork resolution,
self-loop/cycle drop, doubling-horizon prefix semantics, and stitch
ordering. The full-corpus DuckDB oracle comparison for the exported
pagination_chains / stitch_pages queries runs in
tests/test_offdriver_oracles.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.pagination import (  # noqa: E402
    paginate_chains,
    pagination_links,
    stitch_paginated,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string, text string")


def _page(url, head="", body="b", text="t"):
    return (url, f"<html><head>{head}</head><body>{body}</body></html>", text)


S = "https://x.example.com"


def test_links_carriers_and_spellings(spark):
    pages = _pages(
        spark,
        [
            # double-quoted next, rel after href
            _page(f"{S}/a1", '<link href="/a2" rel="next">'),
            # single-quoted previous + uppercase rel value, self-closing
            _page(f"{S}/a2", "<LINK rel='PREVIOUS' href='/a1'/>"),
            # relative href resolves against the page's directory
            _page(f"{S}/dir/a3", '<link rel="next" href="a4">'),
            # body <a rel=next> is NOT a carrier (documented subset)
            _page(f"{S}/a5", "", body='<a rel="next" href="/a6">n</a>'),
            # first declaration wins on malformed repeats
            _page(
                f"{S}/a7",
                '<link rel="next" href="/first"><link rel="next" href="/second">',
            ),
            # unresolvable href (relative against schemeless base) -> null
            ("notaurl", '<html><head><link rel="next" href="x"></head></html>', "t"),
        ],
    )
    got = {r["url"]: (r["next_url"], r["prev_url"]) for r in pagination_links(pages).collect()}
    assert got[f"{S}/a1"] == (f"{S}/a2", None)
    assert got[f"{S}/a2"] == (None, f"{S}/a1")
    assert got[f"{S}/dir/a3"] == (f"{S}/dir/a4", None)
    assert got[f"{S}/a5"] == (None, None)
    assert got[f"{S}/a7"] == (f"{S}/first", None)
    assert got["notaurl"] == (None, None)


def test_links_binary_html_column(spark):
    pages = _pages(spark, [_page(f"{S}/p0", '<link rel="next" href="/p1">')])
    binpages = pages.selectExpr("url", "encode(html, 'UTF-8') AS html", "text")
    [r] = pagination_links(binpages).collect()
    assert r["next_url"] == f"{S}/p1"


def test_chains_basic_dual_carrier_and_existence_gate(spark):
    # 3-page chain: p0 -> p1 -> p2; p1 declares BOTH carriers (dedup),
    # p2's next points at an uncrawled p3 (existence gate drops it).
    pages = _pages(
        spark,
        [
            _page(f"{S}/p0", '<link rel="next" href="/p1">'),
            _page(
                f"{S}/p1",
                '<link rel="next" href="/p2"><link rel="prev" href="/p0">',
            ),
            _page(f"{S}/p2", '<link rel="next" href="/p3">'),
            _page(f"{S}/solo", ""),
        ],
    )
    got = sorted(tuple(r) for r in paginate_chains(pages).collect())
    assert got == [
        (f"{S}/p0", f"{S}/p0", 0),
        (f"{S}/p1", f"{S}/p0", 1),
        (f"{S}/p2", f"{S}/p0", 2),
    ]


def test_chains_fork_resolves_to_min_predecessor(spark):
    # /a and /b both declare next -> /c: deterministic min(ptr) = /a.
    pages = _pages(
        spark,
        [
            _page(f"{S}/a", '<link rel="next" href="/c">'),
            _page(f"{S}/b", '<link rel="next" href="/c">'),
            _page(f"{S}/c", ""),
        ],
    )
    got = sorted(tuple(r) for r in paginate_chains(pages).collect())
    # /b loses the fork and carries no other edge -> not a participant.
    assert got == [
        (f"{S}/a", f"{S}/a", 0),
        (f"{S}/c", f"{S}/a", 1),
    ]


def test_chains_self_loop_and_cycle_drop(spark):
    pages = _pages(
        spark,
        [
            _page(f"{S}/self", '<link rel="next" href="/self">'),
            _page(f"{S}/c1", '<link rel="next" href="/c2">'),
            _page(f"{S}/c2", '<link rel="next" href="/c1">'),
            # a real chain alongside, to prove the drop is selective
            _page(f"{S}/p0", '<link rel="next" href="/p1">'),
            _page(f"{S}/p1", ""),
        ],
    )
    got = sorted(tuple(r) for r in paginate_chains(pages).collect())
    assert got == [
        (f"{S}/p0", f"{S}/p0", 0),
        (f"{S}/p1", f"{S}/p0", 1),
    ]


def test_chains_doubling_horizon_prefix(spark):
    # 6-page chain with max_pages=4: rounds = ceil(log2(4)) = 2, so the
    # horizon is 2^2 = 4 hops — seq 0..4 resolve, page 5 drops.
    rows = [_page(f"{S}/q0", '<link rel="next" href="/q1">')]
    for i in range(1, 5):
        rows.append(_page(f"{S}/q{i}", f'<link rel="next" href="/q{i + 1}">'))
    rows.append(_page(f"{S}/q5", ""))
    pages = _pages(spark, rows)
    got = sorted(tuple(r) for r in paginate_chains(pages, max_pages=4).collect())
    assert got == [(f"{S}/q{i}", f"{S}/q0", i) for i in range(5)]
    # default horizon (64) resolves the whole chain
    full = sorted(tuple(r) for r in paginate_chains(pages).collect())
    assert full == [(f"{S}/q{i}", f"{S}/q0", i) for i in range(6)]


def test_stitch_reading_order_and_sep(spark):
    pages = _pages(
        spark,
        [
            # declared out of row order on purpose
            (f"{S}/p2", '<html><head><link rel="prev" href="/p1"></head></html>', "three"),
            (f"{S}/p0", '<html><head><link rel="next" href="/p1"></head></html>', "one"),
            (f"{S}/p1", '<html><head><link rel="next" href="/p2"></head></html>', "two"),
            (f"{S}/solo", "<html><head></head></html>", "alone"),
        ],
    )
    [r] = stitch_paginated(pages, sep=" | ").collect()
    assert (r["chain_id"], r["n_pages"], r["text"]) == (f"{S}/p0", 3, "one | two | three")


def test_chains_out_fork_is_deterministic_tree(spark):
    # OUT-fork (malformed site): head /h declares next -> /b1 while
    # /b2 independently declares prev -> /h. Each page has ONE
    # predecessor, so the structure is an in-tree: both branches
    # resolve to the head, both carry seq 1, deterministically; stitch
    # orders duplicate seqs by text tiebreak (array_sort on the
    # (seq, text) struct), so the output is stable.
    pages = _pages(
        spark,
        [
            (f"{S}/h", '<html><head><link rel="next" href="/b1"></head></html>', "head"),
            (f"{S}/b1", "<html><head></head></html>", "alpha branch"),
            (f"{S}/b2", '<html><head><link rel="prev" href="/h"></head></html>', "beta branch"),
        ],
    )
    got = sorted(tuple(r) for r in paginate_chains(pages).collect())
    assert got == [
        (f"{S}/b1", f"{S}/h", 1),
        (f"{S}/b2", f"{S}/h", 1),
        (f"{S}/h", f"{S}/h", 0),
    ]
    [r] = stitch_paginated(pages).collect()
    assert (r["chain_id"], r["n_pages"], r["text"]) == (
        f"{S}/h",
        3,
        "head\n\nalpha branch\n\nbeta branch",
    )


def test_comment_and_body_links_ignored(spark):
    # A commented-out template fragment or a <link> appearing after
    # <body> (code sample / noscript echo) must never mint an edge —
    # a false edge REWRITES documents. The real declaration in the
    # same head still resolves.
    pages = _pages(
        spark,
        [
            _page(
                f"{S}/p0",
                head=(
                    '<!-- <link rel="next" href="/poison"> -->'
                    '<link rel="next" href="/p1">'
                ),
                text="a",
            ),
            _page(
                f"{S}/p1",
                body='x<link rel="next" href="/p2">y',
                text="b",
            ),
            _page(f"{S}/p2", text="c"),
            _page(f"{S}/poison", text="z"),
        ],
    )
    lk = {r["url"]: r for r in pagination_links(pages).collect()}
    assert lk[f"{S}/p0"]["next_url"] == f"{S}/p1"  # comment skipped
    assert lk[f"{S}/p1"]["next_url"] is None  # body link skipped
    got = {
        (r["url"], r["chain_id"], r["seq"])
        for r in paginate_chains(pages).collect()
    }
    # chain is exactly p0 -> p1; p2 and poison never join
    assert got == {
        (f"{S}/p0", f"{S}/p0", 0),
        (f"{S}/p1", f"{S}/p0", 1),
    }


def test_unclosed_head_still_scanned(spark):
    # malformed page with no <body> tag at all: split(limit=2)[0] is
    # the whole document, so head declarations still resolve
    rows = [
        (f"{S}/p0", '<html><head><link rel="next" href="/p1">', "a"),
        (f"{S}/p1", "<html><head>", "b"),
    ]
    pages = _pages(spark, rows)
    lk = {r["url"]: r["next_url"] for r in pagination_links(pages).collect()}
    assert lk[f"{S}/p0"] == f"{S}/p1"
