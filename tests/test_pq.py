"""Acceptance gates for the product-quantization ANN path
(operators/pq.py), mirroring tests/test_ivf.py's philosophy:

  * shortlist==corpus equality: when the ADC shortlist covers every
    vector, the exact re-rank sees the whole corpus, so pq_topk must
    return EXACTLY the brute-force answer regardless of codebook
    quality — pins the encode/score/re-rank machinery.
  * recall floors: partial shortlist on the near-uniform corpus
    (adversarial) and the planted-cluster fixture.
  * determinism: two independently trained runs give identical
    codebooks and identical search rows.
  * compression arithmetic: the persisted index columns really are
    m bytes of code per vector.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators import pq, similarity

SF_DIR = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")

N_QUERIES = 10
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    return df.select("vec_id", "embedding")


@pytest.fixture(scope="module")
def books(emb):
    return pq.train_pq_codebooks(emb, m=8, ksub=16, dim=64, iters=3)


@pytest.fixture(scope="module")
def clustered(spark, emb):
    from nidaba_spark.plans.trainingdata import clustered_embeddings

    return clustered_embeddings(emb).cache()


def _queries(df):
    return df.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _hits(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(exact, approx):
    got = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    return got / sum(len(v) for v in exact.values())


def test_full_shortlist_equals_brute_force(spark, emb, books):
    """shortlist >= corpus size -> re-rank sees everything -> exact."""
    n = emb.count()
    q = _queries(emb)
    exact = similarity.brute_force_topk(emb, q, k=K, dim=64).collect()
    approx = pq.pq_topk(
        emb, q, k=K, codebooks=books, shortlist=n
    ).collect()
    tup = lambda rows: sorted(
        (r["query_id"], r["vec_id"], r["sim"], r["rank"]) for r in rows
    )
    assert tup(exact) == tup(approx)


def test_adc_recall_near_uniform(spark, emb, books):
    """10% shortlist on the adversarial corpus (measured 0.82)."""
    q = _queries(emb)
    exact = _hits(similarity.brute_force_topk(emb, q, k=K, dim=64).collect())
    approx = _hits(
        pq.pq_topk(emb, q, k=K, codebooks=books, shortlist=50).collect()
    )
    r = _recall(exact, approx)
    assert r >= 0.7, f"PQ ADC recall {r:.3f} < 0.7"


def test_planted_cluster_recall(spark, clustered):
    q = _queries(clustered)
    exact = _hits(
        similarity.brute_force_topk(clustered, q, k=K, dim=64).collect()
    )
    approx = _hits(
        pq.pq_topk(clustered, q, k=K, iters=3, shortlist=50).collect()
    )
    r = _recall(exact, approx)
    assert r >= 0.9, f"PQ recall on planted clusters {r:.3f} < 0.9"


def test_training_and_search_deterministic(spark, emb, books):
    b2 = pq.train_pq_codebooks(emb, m=8, ksub=16, dim=64, iters=3)
    assert np.array_equal(books, b2)
    q = _queries(emb)
    as_set = lambda rows: {
        (r["query_id"], r["vec_id"], r["sim"], r["rank"]) for r in rows
    }
    r1 = pq.pq_topk(emb, q, k=K, codebooks=books, shortlist=50).collect()
    r2 = pq.pq_topk(emb, q, k=K, codebooks=books, shortlist=50).collect()
    assert as_set(r1) == as_set(r2)


def test_codes_shape_and_compression(spark, emb, books):
    coded = pq.encode_pq(emb, books).collect()
    m, ksub, _ = books.shape
    assert all(len(r["codes"]) == m for r in coded)
    assert all(0 <= c < ksub for r in coded for c in r["codes"])
    # the persisted index is m single-byte codes (+1 float norm) per
    # vector vs dim*4 bytes of float32 — 32x on the vector payload
    assert m * 1 * 32 == 64 * 4


def test_ivfpq_exhaustive_equals_brute_force(spark, emb, books):
    """nprobe == nlist and shortlist == corpus: both pruning axes
    wide open -> must equal the exact answer."""
    n = emb.count()
    q = _queries(emb)
    exact = similarity.brute_force_topk(emb, q, k=K, dim=64).collect()
    approx = pq.ivfpq_topk(
        emb, q, k=K, nlist=8, nprobe=8, iters=2, codebooks=books, shortlist=n
    ).collect()
    tup = lambda rows: sorted(
        (r["query_id"], r["vec_id"], r["sim"], r["rank"]) for r in rows
    )
    assert tup(exact) == tup(approx)


def test_ivfpq_planted_cluster_recall(spark, clustered):
    """Partial probe AND partial shortlist on the clustered fixture."""
    q = _queries(clustered)
    exact = _hits(
        similarity.brute_force_topk(clustered, q, k=K, dim=64).collect()
    )
    approx = _hits(
        pq.ivfpq_topk(
            clustered, q, k=K, nlist=24, nprobe=4, iters=3, shortlist=50
        ).collect()
    )
    r = _recall(exact, approx)
    assert r >= 0.9, f"IVF-PQ recall on planted clusters {r:.3f} < 0.9"


def test_null_embedding_safe(spark, emb, books):
    with_null = emb.limit(50).union(
        spark.createDataFrame(
            [(999999, None)], schema="vec_id long, embedding array<float>"
        )
    )
    coded = pq.encode_pq(with_null, books).collect()
    assert len(coded) == 51
    # vnorm is 0.0 (not null): a null vnorm becomes a NaN ADC score
    # which sorts ABOVE every real double under desc (ADVICE r04)
    null_row = [r for r in coded if r["vec_id"] == 999999][0]
    assert null_row["vnorm"] == 0.0


def test_null_embeddings_never_steal_shortlist_slots(spark, emb, books):
    """ADVICE r04: with a TIGHT shortlist (== k), every slot a
    null-embedding doc steals is an unrecoverable recall loss — the
    exact re-rank can only reorder the shortlist. Top-k over a corpus
    with many nulls must equal top-k over the non-null corpus alone,
    in both pq_topk and ivfpq_topk."""
    base = emb.limit(50)
    nulls = spark.createDataFrame(
        [(900000 + i, None) for i in range(40)],
        schema="vec_id long, embedding array<float>",
    )
    q = _queries(emb)
    tup = lambda rows: sorted(
        (r["query_id"], r["vec_id"], r["sim"], r["rank"]) for r in rows
    )
    clean = pq.pq_topk(base, q, k=K, codebooks=books, shortlist=K).collect()
    dirty = pq.pq_topk(
        base.union(nulls), q, k=K, codebooks=books, shortlist=K
    ).collect()
    assert tup(clean) == tup(dirty)
    clean_i = pq.ivfpq_topk(
        base, q, k=K, nlist=4, nprobe=4, iters=2, codebooks=books, shortlist=K
    ).collect()
    dirty_i = pq.ivfpq_topk(
        base.union(nulls), q, k=K, nlist=4, nprobe=4, iters=2,
        codebooks=books, shortlist=K,
    ).collect()
    assert tup(clean_i) == tup(dirty_i)


def test_pq_topk_preserves_id_types(spark, emb, books):
    """ADVICE r04: out_schema was hardcoded 'long, long' — string ids
    failed or coerced in the mapInPandas stage."""
    svecs = emb.limit(30).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    squeries = _queries(emb).select(
        F.concat(F.lit("q-"), F.col("query_id")).alias("query_id"), "embedding"
    )
    rows = pq.pq_topk(
        svecs, squeries, k=3, codebooks=books, shortlist=10
    ).collect()
    assert rows and all(
        r["query_id"].startswith("q-") and r["vec_id"].startswith("doc-")
        for r in rows
    )


# ------------------------------------------------- persisted index
def test_index_roundtrip_matches_inline(spark, emb, tmp_path_factory):
    """build_ivfpq_index -> ivfpq_topk_index == inline ivfpq_topk with
    the same seed, row for row (same model, same probe math)."""
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    pq.build_ivfpq_index(emb, path, nlist=8, m=8, ksub=16, dim=64, iters=2)
    q = _queries(emb)
    via_index = {
        tuple(r)
        for r in pq.ivfpq_topk_index(
            spark, path, q, emb, k=K, nprobe=4, dim=64
        ).collect()
    }
    cents, books_ = pq.load_ivfpq_model(spark, path)
    inline = {
        tuple(r)
        for r in pq.ivfpq_topk(
            emb, q, k=K, nlist=8, nprobe=4, m=8, ksub=16, dim=64, iters=2,
            centroids=cents, codebooks=books_,
        ).collect()
    }
    assert via_index == inline and via_index


def test_index_scan_is_partition_pruned(spark, emb, tmp_path_factory):
    """The coded scan must carry the probed cells as PartitionFilters
    — the query reads nprobe directories, not the corpus."""
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    pq.build_ivfpq_index(emb, path, nlist=8, m=8, ksub=16, dim=64, iters=2)
    coded = spark.read.parquet(f"{path}/coded").filter(
        F.col("cell").isin([1, 3])
    )
    plan = coded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "cell" in pf and pf.strip()


def test_index_model_roundtrip_exact(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    pq.build_ivfpq_index(emb, path, nlist=8, m=8, ksub=16, dim=64, iters=2)
    from nidaba_spark.operators.ivf import train_centroids

    cents, books_ = pq.load_ivfpq_model(spark, path)
    np.testing.assert_array_equal(
        cents, train_centroids(emb, nlist=8, dim=64, iters=2)
    )
    np.testing.assert_array_equal(
        books_, pq.train_pq_codebooks(emb, m=8, ksub=16, dim=64, iters=2)
    )


def test_index_append_and_compact(spark, emb, tmp_path_factory):
    """Incremental vector index: build on batch A, append_ivfpq batch
    B with the PERSISTED model -> serving equals a single-batch index
    encoding A∪B with that same model; a replayed append converges;
    compact_coded collapses batches with byte-identical results and
    keeps the scan partition-pruned."""
    rows = emb.count()
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    q = _queries(emb)

    inc = str(tmp_path_factory.mktemp("ivfpq") / "inc")
    pq.build_ivfpq_index(a, inc, nlist=8, m=8, ksub=16, dim=64, iters=2)
    pq.append_ivfpq(b, inc, batch_id=1, dim=64)

    # reference: ONE batch holding A∪B encoded with the same model
    ref = str(tmp_path_factory.mktemp("ivfpq") / "ref")
    pq.build_ivfpq_index(a, ref, nlist=8, m=8, ksub=16, dim=64, iters=2)
    cents, books_ = pq.load_ivfpq_model(spark, ref)
    pq.encode_pq(emb, books_, 64, "vec_id", "embedding", centroids=cents)\
        .write.mode("overwrite").partitionBy("cell")\
        .parquet(f"{ref}/coded/batch=0")

    def serve(path):
        return {
            tuple(r)
            for r in pq.ivfpq_topk_index(
                spark, path, q, emb, k=K, nprobe=4, dim=64
            ).collect()
        }

    got = serve(inc)
    assert got == serve(ref) and got
    assert spark.read.parquet(f"{inc}/coded").count() == rows

    # replayed batch (crash recovery) converges
    pq.append_ivfpq(b, inc, batch_id=1, dim=64)
    assert serve(inc) == got
    assert spark.read.parquet(f"{inc}/coded").count() == rows

    # compaction: byte-identical serving, fewer files, pruning intact
    stats = pq.compact_coded(spark, inc)
    assert stats["batches_before"] == 2
    assert stats["coded_files_after"] <= stats["coded_files_before"]
    assert serve(inc) == got
    coded = spark.read.parquet(f"{inc}/coded").filter(F.col("cell").isin([1, 3]))
    plan = coded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
