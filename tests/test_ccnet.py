"""CCNet per-language perplexity buckets (operators/textstats
.ccnet_buckets + the scan-side threshold path): balanced terciles,
deterministic tiebreaks, exact-vs-threshold agreement, tie semantics.

Full DuckDB oracle parity for q_ccnet_buckets (the exact form over the
corpus's unigram-LM score) runs in tests/test_offdriver_oracles.py.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.textstats import (  # noqa: E402
    ccnet_bucket_by_thresholds,
    ccnet_bucket_thresholds,
    ccnet_buckets,
    unigram_logprob,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        unigram_logprob(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .cache()
    )


def test_exact_terciles_are_balanced_per_lang(scored):
    sizes = (
        ccnet_buckets(scored)
        .groupBy("lang", "bucket")
        .count()
        .collect()
    )
    per_lang: dict[str, dict[str, int]] = {}
    for r in sizes:
        per_lang.setdefault(r["lang"], {})[r["bucket"]] = r["count"]
    for lang, b in per_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        assert max(b.values()) - min(b.values()) <= 1, (lang, b)


def test_head_outranks_tail(scored):
    """Every head score >= every tail score within a language."""
    out = ccnet_buckets(scored)
    agg = out.groupBy("lang").agg(
        F.min(F.when(F.col("bucket") == "head", F.col("score"))).alias("h_min"),
        F.max(F.when(F.col("bucket") == "tail", F.col("score"))).alias("t_max"),
    )
    assert agg.filter(F.col("h_min") < F.col("t_max")).count() == 0


def test_threshold_path_agrees_with_exact(scored):
    exact = ccnet_buckets(scored).select("doc_id", "bucket")
    thr = ccnet_bucket_thresholds(scored)
    assert thr.count() == scored.select("lang").distinct().count()
    approx = ccnet_bucket_by_thresholds(scored, thr).select(
        "doc_id", F.col("bucket").alias("b2")
    )
    j = exact.join(approx, "doc_id")
    n = j.count()
    agree = j.filter(F.col("bucket") == F.col("b2")).count()
    assert n == scored.count()
    assert agree / n >= 0.95, (agree, n)


def test_threshold_ties_go_to_head(spark):
    """A constant-score language lands entirely in head on the
    scan-side path (>= cutoffs, keep-more) while the exact rank path
    spreads it into thirds — the documented boundary difference."""
    rows = [(i, "xx", -2.0) for i in range(9)] + [
        (100 + i, "yy", float(-i)) for i in range(9)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    thr = ccnet_bucket_thresholds(df, score_col="score")
    approx = ccnet_bucket_by_thresholds(df, thr, score_col="score")
    assert (
        approx.filter(F.col("lang") == "xx").filter(F.col("bucket") != "head").count()
        == 0
    )
    exact = ccnet_buckets(df, score_col="score")
    xx = {
        r["bucket"]: r["count"]
        for r in exact.filter(F.col("lang") == "xx").groupBy("bucket").count().collect()
    }
    assert xx == {"head": 3, "middle": 3, "tail": 3}
    # the distinct-score language agrees on both paths except possibly
    # one rank-adjacent doc per cutoff: percentile_approx picks an
    # ACTUAL data value for the boundary, which can sit one rank off
    # the percent_rank third (here t_head=-3 vs the exact head floor
    # of -2). Bucket order must still be monotone in score.
    yy = exact.filter(F.col("lang") == "yy").select("doc_id", "score", "bucket")
    yy2 = approx.filter(F.col("lang") == "yy").select(
        "doc_id", F.col("bucket").alias("b2")
    )
    j = yy.join(yy2, "doc_id")
    assert j.filter(F.col("bucket") != F.col("b2")).count() <= 2
    got = [r["b2"] for r in j.orderBy(F.desc("score")).collect()]
    order = {"head": 0, "middle": 1, "tail": 2}
    assert all(order[a] <= order[b] for a, b in zip(got, got[1:])), got


def test_threshold_plan_has_broadcast_join_no_window(scored):
    thr = ccnet_bucket_thresholds(scored)
    plan = (
        ccnet_bucket_by_thresholds(scored, thr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
