"""Corpus snapshot diff (operators/snapshot) + Unicode script ID
(operators/textstats.script_counts): hand cases, tiebreak semantics,
plan shapes. Full DuckDB oracle parity for q_corpus_diff /
q_script_stats runs in tests/test_offdriver_oracles.py.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.snapshot import (  # noqa: E402
    changed_keys,
    corpus_diff,
    corpus_diff_summary,
)
from nidaba_spark.operators.textstats import script_counts  # noqa: E402


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_corpus_diff_hand_case(spark):
    old = _snap(spark, [("a", "one"), ("b", "two"), ("c", "three")])
    new = _snap(spark, [("b", "two"), ("c", "three v2"), ("d", "four")])
    got = {r["url"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        "a": "removed",
        "b": "unchanged",
        "c": "changed",
        "d": "added",
    }
    summary = {
        r["status"]: r["n"] for r in corpus_diff_summary(old, new).collect()
    }
    assert summary == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}
    work = {r["url"] for r in changed_keys(old, new).collect()}
    assert work == {"c", "d"}


def test_corpus_diff_join_carries_hashes_not_text(spark):
    """The shuffle sides must be the slim (url, hash) projections —
    the page text never enters the exchange."""
    old = _snap(spark, [("a", "x" * 100)])
    new = _snap(spark, [("a", "y" * 100)])
    plan = (
        corpus_diff(old, new)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    assert "FullOuter" in plan
    # no operator at or above the join may reference the text
    # attribute — it is pruned into the scan-level hash projection
    lines = plan.splitlines()
    join_line = next(i for i, l in enumerate(lines) if "Join" in l)
    assert all("text#" not in l for l in lines[: join_line + 1]), plan


def test_corpus_diff_empty_sides(spark):
    old = _snap(spark, [("a", "one")])
    empty = _snap(spark, []).filter(F.lit(False))
    assert {
        r["status"] for r in corpus_diff(old, empty).collect()
    } == {"removed"}
    assert {
        r["status"] for r in corpus_diff(empty, old).collect()
    } == {"added"}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_recrawl_priority_hand_case(spark):
    import math

    from nidaba_spark.operators.snapshot import recrawl_priority

    hist = spark.createDataFrame(
        [
            # volatile: 3 visits, both intervals change
            ("u/volatile", 0, "a"), ("u/volatile", 1, "b"), ("u/volatile", 2, "c"),
            # stable: 3 visits, nothing changes
            ("u/stable", 0, "x"), ("u/stable", 1, "x"), ("u/stable", 2, "x"),
            # mixed: 3 visits, one change
            ("u/mixed", 0, "p"), ("u/mixed", 1, "p"), ("u/mixed", 2, "q"),
            # single visit: no interval observed
            ("u/once", 0, "z"),
        ],
        "url string, warc_ts long, text string",
    )
    got = {r["url"]: r for r in recrawl_priority(hist).collect()}
    assert (got["u/volatile"]["n_visits"], got["u/volatile"]["n_changes"]) == (3, 2)
    assert got["u/volatile"]["change_frac"] == 1.0
    assert got["u/stable"]["n_changes"] == 0 and got["u/stable"]["change_frac"] == 0.0
    assert got["u/mixed"]["change_frac"] == 0.5
    assert got["u/once"]["change_frac"] is None
    assert got["u/once"]["change_rate"] is None
    # CGM smoothed estimator: -ln((n - X + 0.5) / (n + 0.5)) over
    # n = 2 intervals — finite for the all-changed url, ordered
    # volatile > mixed > stable
    assert got["u/volatile"]["change_rate"] == pytest.approx(-math.log(0.5 / 2.5))
    assert got["u/mixed"]["change_rate"] == pytest.approx(-math.log(1.5 / 2.5))
    assert got["u/stable"]["change_rate"] == pytest.approx(-math.log(2.5 / 2.5))
    assert (
        got["u/volatile"]["change_rate"]
        > got["u/mixed"]["change_rate"]
        > got["u/stable"]["change_rate"]
        == 0.0
    )
    # more evidence at the same fraction -> higher smoothed rate:
    # 10-of-10 must outrank 1-of-1
    hist2 = spark.createDataFrame(
        [("u/1of1", t, str(t)) for t in range(2)]
        + [("u/10of10", t, str(t)) for t in range(11)],
        "url string, warc_ts long, text string",
    )
    g2 = {r["url"]: r["change_rate"] for r in recrawl_priority(hist2).collect()}
    assert g2["u/10of10"] > g2["u/1of1"]


def test_recrawl_priority_one_exchange_no_text(spark):
    from nidaba_spark.operators.snapshot import recrawl_priority

    hist = spark.createDataFrame(
        [("u", 0, "BIGTEXT"), ("u", 1, "OTHER")],
        "url string, warc_ts long, text string",
    )
    plan = (
        recrawl_priority(hist)._jdf.queryExecution().executedPlan().toString()
    )
    # one url-keyed exchange serves both the lag window and the agg
    assert plan.count("Exchange") == 1
    # text is hashed in the scan-side projection (below the exchange);
    # the window and aggregate operators above it must not carry it
    assert "xxhash64(text" in plan
    for line in plan.splitlines():
        if "Window" in line or "HashAggregate" in line:
            assert "text#" not in line, line


def test_script_counts_hand_case(spark):
    out = {
        r["doc_id"]: r
        for r in script_counts(
            _docs(
                spark,
                [
                    (1, "hello мир 漢字 αβ"),
                    (2, "12345 .,!?"),
                    (3, "שלום עולם"),
                    (4, "ひらがな カタカナ 한글"),
                ],
            )
        ).collect()
    }
    r = out[1]
    assert (r["n_latin"], r["n_cyrillic"], r["n_han"], r["n_greek"]) == (
        5,
        3,
        2,
        2,
    )
    assert r["dominant_script"] == "latin"
    assert out[2]["dominant_script"] == "none"
    assert out[3]["dominant_script"] == "hebrew"
    assert out[3]["n_hebrew"] == 8
    assert (
        out[4]["n_hiragana"],
        out[4]["n_katakana"],
        out[4]["n_hangul"],
    ) == (4, 4, 2)
    assert out[4]["dominant_script"] == "hiragana"  # tie → priority order


def test_script_counts_tiebreak_is_priority_order(spark):
    # latin and cyrillic tied at 3 → latin (earlier in SCRIPT_CLASSES)
    out = script_counts(_docs(spark, [(1, "abc где")])).collect()[0]
    assert out["n_latin"] == out["n_cyrillic"] == 3
    assert out["dominant_script"] == "latin"


def test_script_counts_plan_is_pure_projection(spark):
    df = script_counts(_docs(spark, [(1, "abc")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
