"""Gates for the Bloom-filter decontamination scale path.

The exact variant (operators/filters.decontaminate) is the semantic
oracle here: bloom output must be a SUPERSET of the exact output
(no false negatives — guaranteed by construction, verified anyway),
per-doc bloom n_overlap >= exact n_overlap, over-removal bounded by
the configured fpp, zero shuffles in the train-side physical plan,
and full determinism (rerun + repartition invariance). The query-level
DuckDB oracle (fpp=1e-9 == exact output) runs in
tests/test_offdriver_oracles.py like every off-driver oracle.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark.operators.filters import (  # noqa: E402
    _bloom_params,
    build_ngram_bloom,
    decontaminate,
    decontaminate_bloom,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return train, eval_df


def _as_map(rows):
    return {r["doc_id"]: r["n_overlap"] for r in rows}


def test_bloom_superset_of_exact(split):
    train, eval_df = split
    exact = _as_map(decontaminate(train, eval_df, n=5).collect())
    bloom = _as_map(decontaminate_bloom(train, eval_df, n=5, fpp=1e-4).collect())
    assert set(exact) <= set(bloom), "false negative: contaminated doc not flagged"
    for doc_id, n in exact.items():
        assert bloom[doc_id] >= n, f"doc {doc_id}: bloom {bloom[doc_id]} < exact {n}"
    # one-sided error stays bounded: extra flagged docs <= 2% of train
    n_train = train.count()
    extra = len(set(bloom) - set(exact))
    assert extra <= max(1, n_train * 0.02), (extra, n_train)


def test_bloom_tight_fpp_equals_exact(split):
    train, eval_df = split
    exact = _as_map(decontaminate(train, eval_df, n=5).collect())
    bloom = _as_map(decontaminate_bloom(train, eval_df, n=5, fpp=1e-9).collect())
    assert bloom == exact


def test_bloom_determinism_and_partition_invariance(split):
    train, eval_df = split
    a = _as_map(decontaminate_bloom(train, eval_df, n=5, fpp=1e-4).collect())
    b = _as_map(decontaminate_bloom(train, eval_df, n=5, fpp=1e-4).collect())
    c = _as_map(
        decontaminate_bloom(train.repartition(7), eval_df.repartition(5), n=5, fpp=1e-4)
        .collect()
    )
    assert a == b == c


def test_train_side_plan_has_zero_shuffles(split):
    import contextlib
    import io

    train, eval_df = split
    out = decontaminate_bloom(train, eval_df, n=5, fpp=1e-4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan[:2000]
    assert not re.findall(r"\(\d+\) BroadcastExchange\b", plan), plan[:2000]
    assert "ArrowEvalPython" in plan, plan[:2000]
    # regression pin for the O(words²) collapse: the words split() must
    # stay behind the localCheckpoint leaf — no optimized-plan lambda
    # body may contain split( (same contract as
    # test_plan_shapes.py::test_gram_lambdas_bind_token_array_not_inline_split)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    for line in optimized.splitlines():
        if "lambdafunction(" in line:
            body = line.split("lambdafunction(", 1)[1]
            assert "split(" not in body, line.strip()[:300]


def test_filter_build_roundtrip(spark):
    """Distributed build == known bit membership: every inserted key
    probes to all-ones; sizing formula matches the public one."""
    import numpy as np

    from nidaba_spark.operators.filters import _bloom_probes

    eval_df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + str(i)) for i in range(50)],
        "doc_id long, text string",
    )
    bits_bytes, m_bits, k = build_ngram_bloom(eval_df, n=5, fpp=1e-4)
    bits = np.frombuffer(bits_bytes, dtype=np.uint8)
    # recompute the gram hashes exactly as the builder does, probe each
    from nidaba_spark.operators.filters import _exploded_grams

    hs = (
        _exploded_grams(eval_df, "doc_id", "text", 5, "gram")
        .select(F.xxhash64("gram").alias("h"))
        .distinct()
        .toPandas()["h"]
        .to_numpy()
    )
    assert len(hs) > 0
    idx = _bloom_probes(hs, m_bits, k)
    hit = (
        (bits[(idx >> np.uint64(3)).astype(np.int64)]
         >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    ).all(axis=1)
    assert hit.all(), "an inserted key must always be a member"
    assert m_bits % 8 == 0 and len(bits_bytes) == m_bits // 8
    m, kk = _bloom_params(1_000_000, 0.01, 1 << 15)
    assert 9_500_000 < m < 9_900_000 and kk == 7  # textbook 9.59e6 bits, k=7
