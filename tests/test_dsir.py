"""DSIR importance resampling (operators/dsir.py): directional hand
case, Gumbel top-k exactness/determinism, partitioning invariance, and
plan shape (broadcast delta lookup, no Python, no global-window sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nidaba_spark.operators.dsir import (
    dsir_resample,
    dsir_weights,
    doc_feature_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weights_are_directional(spark):
    """Docs made of the target's vocabulary must outscore docs made of
    raw-only vocabulary — the defining property of the log-ratio."""
    target = _docs(spark, [(100 + i, "alpha beta gamma delta") for i in range(4)])
    raw = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, "zork quux blarg snark")],
    )
    w = {r["doc_id"]: r["logw_micro"] for r in dsir_weights(raw, target).collect()}
    assert w[1] > w[2]


def test_feature_counts_cover_unigrams_and_bigrams(spark):
    rows = doc_feature_counts(_docs(spark, [(1, "a b a")]), n_buckets=10_000).collect()
    # features: a, b, a (unigrams) + 'a b', 'b a' (bigrams) = 5 occurrences
    assert sum(r["k"] for r in rows) == 5


def test_resample_keeps_exactly_k(spark):
    docs = _docs(spark, [(i, f"w{i} w{i % 5} common tokens here") for i in range(60)])
    target = docs.filter(F.col("doc_id") % 6 == 0)
    out = dsir_resample(dsir_weights(docs, target), k=17).collect()
    kept = [r for r in out if r["keep"]]
    assert len(out) == 60 and len(kept) == 17
    # the kept set is exactly the top-17 under (score desc, doc_id asc)
    ranked = sorted(out, key=lambda r: (-r["score_micro"], r["doc_id"]))
    assert {r["doc_id"] for r in ranked[:17]} == {r["doc_id"] for r in kept}


def test_resample_k_zero_keeps_none(spark):
    docs = _docs(spark, [(1, "a b"), (2, "c d")])
    out = dsir_resample(dsir_weights(docs, docs), k=0).collect()
    assert out and not any(r["keep"] for r in out)


def test_resample_small_input_keeps_all(spark):
    docs = _docs(spark, [(1, "a b"), (2, "c d")])
    out = dsir_resample(dsir_weights(docs, docs), k=10).collect()
    assert all(r["keep"] for r in out)


def test_weights_invariant_under_partitioning(spark):
    docs = _docs(spark, [(i, f"t{i % 7} u{i % 3} v w x") for i in range(40)])
    target = docs.filter(F.col("doc_id") % 4 == 0)
    a = {tuple(r) for r in dsir_weights(docs, target).collect()}
    b = {
        tuple(r)
        for r in dsir_weights(docs.repartition(13), target.repartition(3)).collect()
    }
    assert a == b


def test_plan_shape(spark):
    docs = _docs(spark, [(i, "a b c") for i in range(4)])
    # the broadcast delta join lives in the WEIGHTS plan; resample
    # pins its input behind a lazy localCheckpoint (so the threshold
    # collect and the returned frame share one execution), which
    # hides upstream operators from the final plan string
    wplan = dsir_weights(docs, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in wplan or "BroadcastNestedLoop" in wplan
    df = dsir_resample(dsir_weights(docs, docs), k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Window"):
        assert marker not in plan, marker
