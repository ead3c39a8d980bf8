"""Gates for the mergeable-sketch operators (operators/sketches.py).

HLL: estimates within 5% of exact per group; union of per-bucket
sketch rows gives the SAME estimate as one direct aggregation over
the whole corpus (the rescan-free rollup contract). CMS: never
undercounts, overcount bounded by eps·N; merged per-bucket sketches
answer like the single global sketch.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark.operators.sketches import (  # noqa: E402
    cms_estimate,
    cms_merge,
    token_cms,
    token_hll_sketches,
    union_hll,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


@pytest.fixture(scope="module")
def word_counts(spark, docs):
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    return {
        r["word"]: r["c"]
        for r in docs.select(F.explode(w).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .collect()
    }


def test_hll_error_bound_per_lang(spark, docs):
    est = {r["lang"]: r["distinct_tokens_est"] for r in token_hll_sketches(docs).collect()}
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    exact = {
        r["lang"]: r["d"]
        for r in docs.select("lang", F.explode(w).alias("word"))
        .groupBy("lang")
        .agg(F.countDistinct("word").alias("d"))
        .collect()
    }
    assert set(est) == set(exact) and len(exact) >= 2
    for lang, d in exact.items():
        assert abs(est[lang] - d) / d < 0.05, (lang, est[lang], d)


def test_hll_union_of_parts_equals_direct(spark, docs):
    """The rollup contract: sketch each doc_id bucket independently,
    union the sketch rows — same estimate as sketching the whole
    corpus in one pass (associativity of the HLL union)."""
    whole = token_hll_sketches(docs.withColumn("lang", F.lit("all")))
    direct = int(whole.collect()[0]["distinct_tokens_est"])
    parts = token_hll_sketches(
        docs.withColumn("lang", (F.col("doc_id") % 7).cast("string"))
    )
    assert parts.count() == 7
    assert union_hll(parts) == direct


def test_cms_never_undercounts_and_bounded(spark, docs, word_counts):
    eps = 0.001
    sketch = token_cms(docs, eps=eps)
    total = sum(word_counts.values())
    # spot-check the most frequent words plus some rare ones
    items = sorted(word_counts, key=word_counts.get, reverse=True)[:10]
    items += sorted(word_counts, key=word_counts.get)[:10]
    for wd in items:
        est = cms_estimate(spark, sketch, wd)
        assert est >= word_counts[wd], (wd, est, word_counts[wd])
        assert est <= word_counts[wd] + eps * total * 2, (wd, est, word_counts[wd])


def test_cms_merge_matches_global(spark, docs, word_counts):
    parts = [
        token_cms(docs.filter(F.col("doc_id") % 3 == i), eps=0.001) for i in range(3)
    ]
    merged = cms_merge(spark, parts)
    whole = token_cms(docs, eps=0.001)
    for wd in sorted(word_counts, key=word_counts.get, reverse=True)[:5]:
        assert cms_estimate(spark, merged, wd) == cms_estimate(spark, whole, wd)


def test_hll_plan_is_partial_agg_no_python(spark, docs):
    """The sketch agg must run as a two-phase JVM aggregate (partial
    map-side sketches merged after ONE exchange) with no Python."""
    import contextlib
    import io
    import re

    df = token_hll_sketches(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert not re.findall(r"EvalPython|MapInPandas", plan), plan[:2000]
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan[:2000]
    assert len(re.findall(r"ObjectHashAggregate|HashAggregate", plan)) >= 2, plan[:2000]


def test_cms_works_without_lang_column(spark, docs):
    sketch = token_cms(docs.select("doc_id", "text"), eps=0.01)
    assert cms_estimate(spark, sketch, "the") >= 0


def test_empty_inputs_behave(spark, docs):
    import pytest as _pytest

    assert union_hll(token_hll_sketches(docs).limit(0)) == 0
    with _pytest.raises(ValueError):
        cms_merge(spark, [])
