"""robots.txt parsing + honor filter (operators/robots.py) — group
selection, longest-match, tie, comment/CRLF tolerance, wildcard-drop
semantics pinned on hand fixtures; the corpus-level query has an
independently-derived DuckDB oracle (q_robots_filter)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nidaba_spark.operators.robots import robots_filter, robots_rules  # noqa: E402

FIXTURE = [
    # comments stripped, CRLF tolerated, allow out-lengths disallow
    ("a.com", "User-agent: *\r\nDisallow: /private # comment\nAllow: /private/ok\n"),
    # two consecutive user-agent lines = ONE group; specific group
    # wins over the *-group decoy; field case-insensitivity
    (
        "b.com",
        "user-AGENT: mybot\nuser-agent: otherbot\nDisallow: /\nAllow: /data\n"
        "\nUser-agent: *\nDisallow: /data\n",
    ),
    # empty Disallow is a no-op line
    ("c.com", "User-agent: *\nDisallow:\n# nothing disallowed\n"),
    # group for a different agent only -> no effective rules for us
    ("d.com", "User-agent: zbot\nDisallow: /\n"),
    # exact length tie -> Allow wins
    ("e.com", "User-agent: *\nDisallow: /x\nAllow: /x\n"),
    # wildcard rules dropped (documented deviation), literal kept
    ("f.com", "User-agent: *\nDisallow: /w*ld\nDisallow: /real\n"),
]


def _robots(spark):
    return spark.createDataFrame(FIXTURE, "host string, robots_txt string")


def test_robots_rules_parsing(spark):
    got = {
        r["host"]: sorted((x["path"], x["allow"]) for x in r["rules"])
        for r in robots_rules(_robots(spark), agent="mybot").collect()
    }
    assert got == {
        "a.com": [("/private", False), ("/private/ok", True)],
        "b.com": [("/", False), ("/data", True)],  # specific group only
        "e.com": [("/x", False), ("/x", True)],
        "f.com": [("/real", False)],  # wildcard rule dropped
        # c.com (no-op) and d.com (no applicable group) emit no row
    }


def test_robots_filter_decisions(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/private/secret", False),  # /private disallow
            ("https://a.com/private/ok/x", True),  # longer allow wins
            ("https://a.com/other", True),  # no matching rule
            ("https://b.com/data/set", True),  # allow /data beats /
            ("https://b.com/else", False),  # disallow / catches
            ("https://c.com/anything", True),  # empty Disallow no-op
            ("https://d.com/x", True),  # zbot group not ours
            ("https://e.com/x/t", True),  # tie -> allow
            ("https://f.com/wXld", True),  # wildcard rule dropped
            ("https://f.com/realpath", False),  # literal prefix hits
            ("https://nohost.org/q", True),  # host without robots row
        ],
        "url string, expected boolean",
    )
    out = robots_filter(pages, _robots(spark), agent="mybot")
    for r in out.collect():
        assert r["robots_allowed"] == r["expected"], r["url"]
    # schema hygiene: helper columns dropped, input columns preserved
    assert out.columns == ["url", "expected", "robots_allowed"]


def test_robots_hardening_cases(spark):
    """Review-pass regressions: leading BOM must not disable the file;
    host comparison is case-normalized on BOTH sides; uppercase-scheme
    URLs evaluate their real path; duplicate host rows pick ONE
    deterministic file instead of interleaving lines."""
    robots = spark.createDataFrame(
        [
            ("g.com", "\ufeff" "User-agent: *\nDisallow: /blocked"),
            ("WWW.H.com", "User-agent: *\nDisallow: /x"),
        ],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [
            ("https://g.com/blocked/page", False),  # BOM-prefixed file applies
            ("HTTPS://g.com/blocked/page", False),  # uppercase scheme, real path
            ("https://www.h.com/x/1", False),  # robots host was mixed-case
            ("https://www.h.com/y", True),
        ],
        "url string, expected boolean",
    )
    out = robots_filter(pages, robots, agent="anybot")
    for r in out.collect():
        assert r["robots_allowed"] == r["expected"], r["url"]

    # duplicate host rows: both runs pick the SAME representative file
    dup = spark.createDataFrame(
        [
            ("d.com", "User-agent: *\nDisallow: /a"),
            ("d.com", "User-agent: *\nDisallow: /b"),
        ],
        "host string, robots_txt string",
    )
    r1 = {
        tuple(sorted((x["path"], x["allow"]) for x in r["rules"]))
        for r in robots_rules(dup, agent="*").collect()
    }
    r2 = {
        tuple(sorted((x["path"], x["allow"]) for x in r["rules"]))
        for r in robots_rules(dup.repartition(4), agent="*").collect()
    }
    assert r1 == r2 and len(r1) == 1
    (only,) = r1
    assert only in ((("/a", False),), (("/b", False),))  # one file, not both


def test_robots_wildcard_agent_caller(spark):
    """agent='*' selects only literal *-groups (rank-0 match IS the
    star token) — b.com's star group applies, its mybot group not."""
    out = robots_filter(
        spark.createDataFrame(
            [("https://b.com/data/set",)], "url string"
        ),
        _robots(spark),
        agent="*",
    )
    # star group disallows /data
    assert [r["robots_allowed"] for r in out.collect()] == [False]


def test_robots_filter_page_side_plan(spark):
    """Scale shape: with broadcast_rules (the default) the PAGE side
    pays ZERO shuffle — BroadcastHashJoin, no Exchange on the page
    branch; the only Exchanges in the whole plan belong to the
    host-keyed rules build over the (file-sized) robots rows. With
    broadcast_rules=False the join degrades to one host-keyed
    shuffle — the documented planetary-host fallback."""
    import re

    pages = spark.createDataFrame(
        [(f"https://a.com/p/{i}",) for i in range(50)], "url string"
    )
    out = robots_filter(pages, _robots(spark), agent="mybot")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # the page branch = everything above/feeding the broadcast join
    # probe side; its scan must feed the join through projections only
    page_branch = plan.split("BroadcastHashJoin")[0]
    assert not re.findall(r"\(\d+\) Exchange\b", page_branch), page_branch

    nb = robots_filter(
        pages, _robots(spark), agent="mybot", broadcast_rules=False
    )
    nplan = nb._jdf.queryExecution().executedPlan().toString()
    assert re.findall(r"(?:SortMerge|ShuffledHash)Join", nplan), nplan[:1500]


def test_url_path_query_forms(spark):
    # authority must stop at '?': a no-path query evaluates as the
    # RFC 9309 effective form '/?...' (so 'Disallow: /?sessionid='
    # actually blocks it), and a query containing '/' is never
    # misread as the path
    from nidaba_spark.operators.robots import url_path

    cases = [
        ("https://h.example/a/b?x=1", "/a/b?x=1"),
        ("https://h.example?id=1", "/?id=1"),
        ("https://h.example?x/y", "/?x/y"),
        ("HTTPS://h.example", "/"),
        ("https://h.example/", "/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["p"] for r in df.select(url_path(F.col("url")).alias("p")).collect()]
    assert got == [p for _, p in cases]


def test_bom_mojibake_stripped(spark):
    # crawl bytes decoded as ISO-8859-1 turn a UTF-8 BOM into the
    # printable mojibake prefix; either form must not orphan the
    # first directive's whole group
    moji = b"\xef\xbb\xbf".decode("ISO-8859-1")
    txt = moji + "User-agent: *\nDisallow: /private\n"
    robots = spark.createDataFrame(
        [("h.example", txt)], "host string, robots_txt string"
    )
    rules = {r["host"]: r["rules"] for r in robots_rules(robots).collect()}
    assert rules and rules["h.example"][0]["path"] == "/private"
