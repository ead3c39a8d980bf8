"""Corpus snapshot diff (operators/snapshot) + Unicode script ID
(operators/textstats.script_counts): hand cases, tiebreak semantics,
plan shapes. Full DuckDB oracle parity for q_corpus_diff /
q_script_stats runs in tests/test_offdriver_oracles.py.
"""

from __future__ import annotations

import os
import sys

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
