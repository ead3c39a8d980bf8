"""Stupid Backoff bigram LM (operators/lm.py): hand-worked three-tier
case, hot/cold split invariance, plan shape (no Python, no inlined
split in gram lambdas), and the mandatory mega-page linearity probe
for any new gram-ish operator."""

from __future__ import annotations

import math
import time

import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators.lm import doc_bigrams, stupid_backoff_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_bigrams_positions_and_short_docs(spark):
    rows = doc_bigrams(
        _docs(spark, [(1, "a b a b"), (2, "solo"), (3, "")])
    ).collect()
    got = [(r["doc_id"], r["w1"], r["w2"]) for r in rows]
    assert got == [(1, "a", "b"), (1, "b", "a"), (1, "a", "b")]


def test_three_backoff_tiers_hand_case(spark):
    """LM corpus: 'the cat sat' + 'the cat ran' (N=6).
    Scored doc: 'the cat moo zzz' — positions:
      (the,cat)  seen bigram: c12=2, c1(the)=2 -> log10(1)        = 0
      (cat,moo)  unseen bigram, moo OOV        -> log10(.4/6)
      (moo,zzz)  unseen bigram, zzz OOV        -> log10(.4/6)
    """
    lm = _docs(spark, [(10, "the cat sat"), (11, "the cat ran")])
    scored = _docs(spark, [(1, "the cat moo zzz")])
    row = stupid_backoff_score(scored, lm).collect()[0]
    oov = round(math.log10(0.4 / 6.0) * 1e6)
    expect = round((0 + 2 * oov) / 1e6 / 3, 6)
    assert row["n_bigrams"] == 3
    assert row["avg_logscore"] == pytest.approx(expect, abs=1e-9)


def test_unigram_backoff_tier(spark):
    """(sat, the): bigram never seen but both words in the LM ->
    alpha * c(the)/N = .4 * 2/6."""
    lm = _docs(spark, [(10, "the cat sat"), (11, "the cat ran")])
    scored = _docs(spark, [(1, "sat the")])
    row = stupid_backoff_score(scored, lm).collect()[0]
    expect = round(round(math.log10(0.4 * 2 / 6.0) * 1e6) / 1e6, 6)
    assert row["n_bigrams"] == 1
    assert row["avg_logscore"] == pytest.approx(expect, abs=1e-9)


def test_trigram_four_tiers_hand_case(spark):
    """order=3 on LM {'a b c d', 'a b x'} (N=7): one scored doc per
    resolution tier, each with exactly one trigram position."""
    lm = _docs(spark, [(10, "a b c d"), (11, "a b x")])
    scored = _docs(
        spark,
        [
            (1, "a b c"),  # tier 3: c(abc)=1 / c(ab)=2
            (2, "x b c"),  # tier 2: a*c(bc)/c(b) = .4*1/2
            (3, "q q a"),  # tier 1: a^2*c(a)/N = .16*2/7
            (4, "q q q"),  # floor:  a^2/N
        ],
    )
    got = {
        r["doc_id"]: r["avg_logscore"]
        for r in stupid_backoff_score(scored, lm, order=3).collect()
    }
    a2 = 0.4 * 0.4
    exp = {
        1: round(math.log10(1 / 2) * 1e6),
        2: round(math.log10(0.4 * 1 / 2) * 1e6),
        3: round(math.log10(a2 * 2 / 7.0) * 1e6),
        4: round(math.log10(a2 / 7.0) * 1e6),
    }
    for d, micro in exp.items():
        assert got[d] == pytest.approx(round(micro / 1e6, 6), abs=1e-9), d
    # short docs (<3 words) emit nothing at order=3
    assert set(got) == {1, 2, 3, 4}


def test_hot_cold_split_is_invisible(spark):
    """Output is identical for ANY hot-set size — n_hot=0 (everything
    via the cold shuffle join) vs n_hot huge (everything broadcast)."""
    docs = _docs(
        spark,
        [(i, f"the cat w{i} jumped over the w{i % 3} dog") for i in range(40)],
    )
    lm = docs.filter(F.col("doc_id") % 2 == 0)
    a = {
        (r["doc_id"], r["n_bigrams"], r["avg_logscore"])
        for r in stupid_backoff_score(docs, lm, n_hot=0).collect()
    }
    b = {
        (r["doc_id"], r["n_bigrams"], r["avg_logscore"])
        for r in stupid_backoff_score(docs, lm, n_hot=10**6).collect()
    }
    c = {
        (r["doc_id"], r["n_bigrams"], r["avg_logscore"])
        for r in stupid_backoff_score(docs, lm, n_hot=3).collect()
    }
    assert a == b == c and len(a) == 40


def test_plan_no_python_and_no_inline_split_in_lambda(spark):
    docs = _docs(spark, [(1, "a b c")])
    df = stupid_backoff_score(docs, docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    for line in optimized.splitlines():
        if "lambdafunction(" in line:
            body = line.split("lambdafunction(", 1)[1]
            assert "split(" not in body, line[:400]


def test_mega_page_linear(spark):
    """The mega-page probe (memory: short docs hide every quadratic).
    50k words -> ~50k bigram positions; quadratic re-tokenization
    would be ~2.5e9 splits and minutes of wall. Bound generously."""
    words = " ".join(f"w{i % 997}" for i in range(50_000))
    docs = _docs(spark, [(1, words), (2, "w1 w2 w3")])
    t0 = time.monotonic()
    rows = stupid_backoff_score(docs, docs).collect()
    elapsed = time.monotonic() - t0
    assert {r["doc_id"]: r["n_bigrams"] for r in rows} == {1: 49_999, 2: 2}
    assert elapsed < 60, f"mega-page took {elapsed:.1f}s — quadratic regression?"


def test_query_plan_scans_corpus_once(spark):
    """The scoring side reads the documents parquet exactly ONCE (the
    module's single-lineage claim); the checkpointed model tables show
    up as RDD scans (local block reads), never as parquet re-scans,
    and the zipf heads join via broadcast."""
    import re

    from nidaba_spark.plans import trainingdata as td

    import os

    df = td.QUERIES["lm_score"](
        spark, os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2
