"""Soft URL quality scoring (operators/urlqual) on hand-built urls:
feature extraction exactness, substring-matching semantics (including
the documented benign collisions), filter threshold behavior, and the
zero-shuffle plan shape."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.urlqual import (  # noqa: E402
    url_feature_cols,
    url_quality,
    url_quality_filter,
)

URLS = [
    "https://www.example.com/a/b/c?x=1&y=2",
    "http://10.1.2.3/login",
    "HTTPS://Sub.Example.ORG/Path",  # scheme/host case-folded
    "http://best-cheap-pills-24-7.biz/v1agra",  # hyphens, no soft hit
    "https://sussex.ac.uk/history",  # 'sex' substring collision
    "http://casino-poker-online.example/play?a=1&b=2&c=3&d=4&e=5&f=6&g=7",
    "https://files.example.com/f%20o%2Fo%2fbar",
    "plainhost/no-scheme",
    "https://example.com/" + "x" * 200,  # long url penalty
]


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    return {r["url"]: r.asDict() for r in url_quality(df).collect()}


def test_host_and_ip(feats):
    assert feats[URLS[0]]["host"] == "example.com"  # www stripped
    assert feats[URLS[2]]["host"] == "sub.example.org"
    assert feats[URLS[7]]["host"] == "plainhost"
    assert feats[URLS[1]]["is_ip_host"] is True
    assert all(
        feats[u]["is_ip_host"] is False for u in URLS if u != URLS[1]
    )


def test_lexical_features(feats):
    f0 = feats[URLS[0]]
    assert f0["path_depth"] == 3  # /a/b/c
    assert f0["n_params"] == 2
    assert f0["pct_encoded"] == 0
    f6 = feats[URLS[6]]
    assert f6["pct_encoded"] == 3  # %20 %2F %2f (case-folded)
    f5 = feats[URLS[5]]
    assert f5["n_params"] == 7
    f3 = feats[URLS[3]]
    assert f3["host_hyphens"] == 4
    assert f3["host_digit_frac"] > 0  # 24-7 digits
    assert f3["soft_word_score"] == 0.0  # 'v1agra' leet evades: documented
    assert feats[URLS[8]]["url_len"] > 200


def test_soft_word_substring_semantics(feats):
    # glued words hit (substring matching is the point)
    assert feats[URLS[5]]["soft_word_score"] == pytest.approx(1.4)  # casino+poker
    # benign collision hits at low weight, score stays below any sane cut
    f4 = feats[URLS[4]]
    assert f4["soft_word_score"] == pytest.approx(0.25)
    assert f4["url_score"] < 0.5


def test_filter_threshold(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    kept = {r["url"] for r in url_quality_filter(df, max_score=1.0).collect()}
    assert URLS[5] not in kept  # casino+poker+params saturates
    assert URLS[0] in kept and URLS[4] in kept
    # a near-zero threshold drops anything with any signal at all;
    # a fully clean url (no digits/params/%-escapes/keywords) survives
    clean = "https://example.org/about/team"
    df2 = spark.createDataFrame([(u,) for u in URLS + [clean]], "url string")
    kept0 = {
        r["url"] for r in url_quality_filter(df2, max_score=0.01).collect()
    }
    assert clean in kept0
    assert URLS[0] not in kept0  # 2 query params -> score 0.1
    score = df2.filter(F.col("url") == clean).select(
        url_feature_cols(F.col("url"))[-1]
    ).collect()[0][0]
    assert score == 0.0


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    plan = (
        url_quality_filter(df, max_score=1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_url_is_no_information(spark):
    # NULL url must score 0.0 and PASS the filter (missing data is not
    # junk; consistent with filter_blocked's anti-join passing NULLs).
    # Before the fix, Spark's null-skipping least() saturated four
    # capped components and scored NULL urls 1.3 -> silently dropped.
    df = spark.createDataFrame(
        [(1, "https://example.com/a"), (2, None)], "id int, url string"
    )
    rows = {r["id"]: r for r in df.select("id", *url_feature_cols(F.col("url"))).collect()}
    assert rows[2]["url_score"] == 0.0
    assert rows[2]["soft_word_score"] == 0.0
    assert rows[2]["url_len"] == 0
    kept = {r["id"] for r in url_quality_filter(df, max_score=1.0, url_col="url").collect()}
    assert kept == {1, 2}


def test_empty_soft_words(spark):
    # soft_words=() disables keyword scoring: lexical features only,
    # soft_word_score 0.0 (was a TypeError from F.round(None, 4))
    df = spark.createDataFrame([("http://xxx-porn.example/casino",)], "url string")
    r = df.select(*url_feature_cols(F.col("url"), soft_words=())).collect()[0]
    assert r["soft_word_score"] == 0.0
    assert r["url_score"] < 1.0
    assert url_quality_filter(df, max_score=1.0, soft_words=()).count() == 1
