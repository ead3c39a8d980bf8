"""Acceptance gates for the LSH family (VERDICT r01 item 3).

dedup_minhash_lsh / dedup_simhash / ann_lsh have no SQL oracle by
nature; these tests convert them from "runs" to "measured correct":

  * precision: every emitted pair/hit carries an exactly-verified
    score (the operators re-verify candidates), so each must agree
    with an independent pure-Python recomputation — precision 1.0.
  * recall: fraction of the exact answer set recovered, measured at
    sf0.001 against brute force and pinned to a floor. The corpora are
    deterministic, so these are exact regression pins, not flaky
    statistical tests.
  * simhash blocking is pigeonhole-EXHAUSTIVE for hamming<=3 over 4
    16-bit chunks, so its gate is equality, not a floor.
"""

from __future__ import annotations

import os
import re

import pytest

from nidaba_spark.operators import dedup, similarity

SF_DIR = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")

MINHASH_RECALL_FLOOR = 0.80
ANN_RECALL_FLOOR = 0.60  # nbits=8 single-table multi-probe; see test note


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _shingles(text: str, k: int = 3) -> frozenset[str]:
    toks = _tokens(text)
    if len(toks) >= k:
        return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
    if toks:
        return frozenset([" ".join(toks)])
    return frozenset()


def _jaccard(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return round(len(a & b) / u, 6) if u else 0.0


@pytest.fixture(scope="module")
def docs_local(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return {r["doc_id"]: r["text"] for r in df.select("doc_id", "text").collect()}


@pytest.fixture(scope="module")
def exact_shingle_pairs(docs_local):
    """Brute-force shingle-Jaccard pairs >= 0.4 (the minhash target)."""
    sh = {i: _shingles(t) for i, t in docs_local.items()}
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _jaccard(sh[a], sh[b])
            if j >= 0.4:
                out[(a, b)] = j
    return out


def test_minhash_lsh_precision_and_recall(spark, exact_shingle_pairs):
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(df, threshold=0.4).collect()
    }
    # precision 1.0: every emitted pair is in the exact set with the same score
    wrong = {p: j for p, j in got.items() if exact_shingle_pairs.get(p) != j}
    assert wrong == {}, f"{len(wrong)} pairs not exactly verified: {list(wrong)[:3]}"
    # recall floor vs exact brute force
    recall = len(got) / len(exact_shingle_pairs) if exact_shingle_pairs else 1.0
    assert exact_shingle_pairs, "corpus produced no exact pairs — gate is vacuous"
    assert recall >= MINHASH_RECALL_FLOOR, f"minhash recall {recall:.3f}"


def test_simhash_blocking_is_exhaustive(spark):
    """Pigeonhole: hamming<=3 pairs MUST share one of 4 16-bit chunks,
    so the blocked join equals brute force exactly (recall == 1.0)."""
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sims = {r["id"]: r["sim"] for r in dedup.simhash_table(df).collect()}
    ids = sorted(sims)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((sims[a] ^ sims[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= 3:
                expected[(a, b)] = h
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(df, max_hamming=3).collect()
    }
    assert got == expected
    assert expected, "corpus produced no simhash pairs — gate is vacuous"


def test_embedding_near_dup_lsh_vs_exact(spark):
    """The banded-LSH near-dup path must be a strict subset of the
    exact O(n^2) pairs with identical sims (precision 1.0 — it
    re-verifies), and recover most of them (S-curve at r=4/B=16 gives
    >=0.96 expected recall at sim>=0.45; the floor leaves slack for
    the planted pairs' actual sims)."""
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.near_dup_pairs(emb, threshold=0.45, dim=64).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.near_dup_pairs_lsh(emb, threshold=0.45, dim=64).collect()
    }
    wrong = {p: s for p, s in got.items() if exact.get(p) != s}
    assert wrong == {}, f"pairs not in exact set / wrong sim: {list(wrong)[:3]}"
    assert exact, "corpus produced no exact near-dup pairs — gate is vacuous"
    recall = len(got) / len(exact)
    assert recall >= 0.85, f"near-dup LSH recall {recall:.3f}"


def test_embedding_near_dup_lsh_strict(spark):
    """Gate for the production-regime query (VERDICT r03 next #7):
    r=8/B=8 at t>=0.85 over the planted-cluster fixture. Subset of
    exact with identical sims (precision 1.0), recall floor 0.9
    (S-curve at sim~0.978 predicts ~0.999), and the candidate rate is
    measured through the operator's own candidate generator."""
    from pyspark.sql import functions as F

    from nidaba_spark.plans.trainingdata import clustered_embeddings

    emb = clustered_embeddings(
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    )
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.near_dup_pairs(emb, threshold=0.85, dim=64).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.near_dup_pairs_lsh(
            emb, threshold=0.85, bands=8, band_bits=8, dim=64
        ).collect()
    }
    wrong = {p: s for p, s in got.items() if exact.get(p) != s}
    assert wrong == {}, f"pairs not in exact set / wrong sim: {list(wrong)[:3]}"
    assert exact, "fixture produced no exact pairs >=0.85 — gate is vacuous"
    recall = len(got) / len(exact)
    assert recall >= 0.9, f"strict near-dup recall {recall:.3f}"

    n = emb.count()
    sk = emb.select(
        F.col("vec_id").alias("id"),
        similarity._hyperplane_bits(F.col("embedding"), 64, 64).alias("sketch"),
    )
    n_cand = similarity.lsh_candidate_pairs(sk, bands=8, band_bits=8).count()
    rate = n_cand / (n * (n - 1) / 2)
    print(
        f"strict near-dup: n={n} exact={len(exact)} recall={recall:.3f} "
        f"candidates={n_cand} rate={rate:.4f}"
    )
    assert rate < 0.5, f"candidate rate {rate:.3f} — prefilter not pruning"


def test_hyperplane_sketch_null_embeddings(spark):
    """ADVICE r03: a null embedding must yield a null sketch (the
    pre-r03 Column-expression behavior) — not raise inside np.stack."""
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(0, [float(i) for i in range(64)]), (1, None), (2, [1.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    by_id = {
        r["vec_id"]: r["sk"]
        for r in emb.select(
            "vec_id",
            similarity._hyperplane_bits(F.col("embedding"), 64, 64).alias("sk"),
        ).collect()
    }
    assert by_id[1] is None
    assert by_id[0] is not None and by_id[2] is not None
    # non-null rows are unaffected by the presence of a null neighbor
    dense = {
        r["vec_id"]: r["sk"]
        for r in emb.filter("vec_id != 1")
        .select(
            "vec_id",
            similarity._hyperplane_bits(F.col("embedding"), 64, 64).alias("sk"),
        )
        .collect()
    }
    assert dense == {k: v for k, v in by_id.items() if k != 1}


def test_ann_lsh_recall_on_clustered_embeddings(spark):
    """Planted-cluster fixture (VERDICT r02 missing #4): the synthetic
    near-uniform corpus only exercises the LSH-adversarial regime; this
    pins the docstring's claim for REALISTIC clustered embeddings. 20
    seed-derived Gaussian centroids x 50 points with sigma=0.15 noise
    put same-cluster sims ~0.97 and cross-cluster near 0 — the regime
    the production r=8/B=8 layout is tuned for. Floor 0.9 (measured
    recall should sit ~1.0: S-curve at sim 0.97, p=1-acos/pi~0.92,
    1-(1-p^8)^8 ~ 1.0)."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    centroids = rng.standard_normal((20, 64))
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(50):
            v = centroids[c] + 0.15 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )  # one probe per cluster
    exact = similarity.brute_force_topk(emb, queries, k=5, dim=64).collect()
    approx = similarity.lsh_topk(emb, queries, k=5, bands=8, band_bits=8).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(approx_sets.get(q, set()) & hits) / len(hits)
        for q, hits in exact_sets.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"clustered ann mean recall@5 {mean_recall:.3f}"


def test_ann_lsh_recall_vs_brute_force(spark):
    """Recall@5 of the banded hyperplane-LSH path against exact top-5,
    plus score fidelity: any (query, vec) the LSH path returns must
    carry the exact cosine (it re-ranks exactly inside buckets).
    Measured 0.70 at r=8/B=8 + 1-bit probes on the near-uniform
    synthetic embeddings (LSH-adversarial regime — neighbors barely
    above background; the r01 single-table variant measured 0.32);
    floor at 0.60 leaves drift slack. Real clustered embeddings sit
    far right on the S-curve (see lsh_topk docstring)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, queries, k=5, dim=64).collect()
    approx = similarity.lsh_topk(emb, queries, k=5).collect()
    exact_sims = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact}
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        if (r["query_id"], r["vec_id"]) in exact_sims:
            assert r["sim"] == exact_sims[(r["query_id"], r["vec_id"])]
    recalls = [
        len(approx_sets.get(q, set()) & hits) / len(hits)
        for q, hits in exact_sets.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= ANN_RECALL_FLOOR, f"ann mean recall@5 {mean_recall:.3f}"


def test_zero_norm_vector_never_ranks(spark):
    # an all-zero embedding (failed/padded) used to score NaN (0/0),
    # and Spark orders NaN above every real double — so it ranked #1
    # for EVERY query; the zero-norm guard scores it 0.0 instead
    from nidaba_spark.operators.similarity import brute_force_topk

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero norm
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = spark.createDataFrame([(100, [1.0, 0.0, 0.0, 0.0])],
                               "query_id long, embedding array<float>")
    for dim in (None, 4):  # both _dot paths
        got = brute_force_topk(vecs, qs, k=2, dim=dim).collect()
        ranked = [(r["vec_id"], r["rank"]) for r in got]
        assert (3, 1) not in ranked and (3, 2) not in ranked
        assert ranked[0][0] == 1


def test_simhash_rejects_incomplete_distance(spark):
    # 4x16-bit chunk blocking is pigeonhole-complete only for
    # hamming <= 3; larger distances would silently lose pairs
    import pytest as _pytest

    from nidaba_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, max_hamming=4)


def test_lsh_store_records_shingle_k(spark, tmp_path):
    # shingle_k determines signature comparability: it must persist in
    # _meta and come back from the store, so a probe cannot silently
    # compare 3-gram signatures against a 5-gram index
    from nidaba_spark.operators.dedup import _lsh_meta, write_lsh_index

    docs = spark.createDataFrame(
        [(i, f"one two three four five six seven {i}") for i in range(6)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "store5")
    write_lsh_index(docs, path, shingle_k=5)
    assert _lsh_meta(spark, path) == (64, 16, 64, 5)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="this append passed"):
        write_lsh_index(docs, path, batch_id=1, shingle_k=3)
