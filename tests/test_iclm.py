"""ICLM related-document packing (operators/iclm.iclm_pack):
same-neighborhood coherence vs the id-order baseline, exact pack
arithmetic vs a SQL window over the same ordering, determinism,
null-embedding overflow routing.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.iclm import iclm_pack  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 2000


@pytest.fixture(scope="module")
def emb(spark):
    # synthetic token counts ride the embeddings table: labels are the
    # planted ground-truth clusters the coherence gate scores against
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .withColumn("n_est", (100 + F.col("vec_id") % 400).cast("long"))
        .cache()
    )


@pytest.fixture(scope="module")
def packed(emb):
    return iclm_pack(
        emb, F.col("n_est"), BUDGET, nlist=8, id_col="vec_id"
    ).cache()


def _adjacent_same_label_frac(pairs_key_label):
    ordered = sorted(pairs_key_label)
    same = sum(
        1 for (_, a), (_, b) in zip(ordered, ordered[1:]) if a == b
    )
    return same / (len(ordered) - 1)


def test_coherence_on_planted_clusters(spark):
    """Deterministic well-separated clusters: ICLM ordering must make
    adjacent docs overwhelmingly same-cluster; id order interleaves
    clusters (ids stripe across labels) at ~1/n_labels."""
    n_lab, dim = 5, 64
    rows = []
    for i in range(300):
        lab = i % n_lab
        vec = [0.0] * dim
        for d in range(dim):
            if lab * 12 <= d < lab * 12 + 12:
                vec[d] = 1.0 + ((i * 31 + d) % 7 - 3) / 30.0
            else:
                vec[d] = ((i * 17 + d * 5) % 11 - 5) / 100.0
        rows.append((i, vec, lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).withColumn("n_est", (100 + F.col("vec_id") % 40).cast("long"))
    out = iclm_pack(df, F.col("n_est"), BUDGET, nlist=n_lab, id_col="vec_id")
    lab = {r["vec_id"]: r["label"] for r in df.select("vec_id", "label").collect()}
    iclm_frac = _adjacent_same_label_frac(
        [(r["tokens_before"], lab[r["vec_id"]]) for r in out.collect()]
    )
    id_frac = _adjacent_same_label_frac([(i, lab[i]) for i in lab])
    assert id_frac <= 0.05, id_frac
    assert iclm_frac >= 0.9, (iclm_frac, id_frac)


def test_intra_pack_cosine_beats_id_order(emb, packed):
    """On the real testdata vectors, packs drawn from one IVF cell
    must be geometrically tighter (higher mean intra-pack pairwise
    cosine) than packs cut from plain id order."""
    import numpy as np

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    for v in vecs.values():
        v /= max(np.linalg.norm(v), 1e-12)

    def mean_intra(groups):
        sims = []
        for g in groups:
            m = np.stack([vecs[i] for i in g])
            if len(g) < 2:
                continue
            s = m @ m.T
            iu = np.triu_indices(len(g), 1)
            sims.append(float(s[iu].mean()))
        return sum(sims) / len(sims)

    by_pack: dict[int, list[int]] = {}
    for r in packed.collect():
        by_pack.setdefault(r["pack_id"], []).append(r["vec_id"])
    rows = sorted(vecs)
    per = max(2, len(rows) // max(1, len(by_pack)))
    id_groups = [rows[i : i + per] for i in range(0, len(rows), per)]
    iclm_sim = mean_intra(by_pack.values())
    id_sim = mean_intra(id_groups)
    assert iclm_sim > id_sim, (iclm_sim, id_sim)


def test_same_cell_docs_are_contiguous(packed):
    rows = sorted(packed.collect(), key=lambda r: r["tokens_before"])
    seen, prev = set(), None
    for r in rows:
        if r["cell"] != prev:
            assert r["cell"] not in seen, "cell split into two runs"
            seen.add(r["cell"])
            prev = r["cell"]


def test_pack_arithmetic_matches_sql_window(spark, emb, packed):
    """Given the cell assignments, the prefix sum / pack ids must be
    EXACTLY the single-partition SQL window over (cell, id) order —
    the distributed path may not drift from the semantics."""
    got = {r["vec_id"]: r for r in packed.collect()}
    rows = sorted(
        [(r["vec_id"], r["cell"], r["n_tokens"]) for r in packed.collect()],
        key=lambda t: (t[1], t[0]),
    )
    before = 0
    for vid, _cell, n in rows:
        r = got[vid]
        assert r["tokens_before"] == before, vid
        assert r["pack_id"] == before // BUDGET, vid
        before += n


def test_deterministic_and_partitioning_invariant(emb):
    a = iclm_pack(emb, F.col("n_est"), BUDGET, nlist=8, id_col="vec_id")
    b = iclm_pack(
        emb.repartition(13), F.col("n_est"), BUDGET, nlist=8, id_col="vec_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_null_embeddings_go_to_overflow_cell(spark, emb):
    with_null = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 10 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    out = iclm_pack(with_null, F.col("n_est"), BUDGET, nlist=8, id_col="vec_id")
    nulls = out.filter(F.col("vec_id") % 10 == 0)
    assert nulls.filter(F.col("cell") != 8).count() == 0
    assert nulls.count() == with_null.filter(F.col("vec_id") % 10 == 0).count()


def test_iclm_pack_default_vectors_uses_id_col(spark):
    # the documented default (vectors = docs itself) used to raise
    # AnalysisException demanding a 'vec_id' column; with vectors
    # omitted, vec_id_col now follows id_col
    docs = spark.createDataFrame(
        [
            (i, 50, [float(i % 4 == j) for j in range(8)])
            for i in range(24)
        ],
        "doc_id long, n_tokens long, embedding array<float>",
    )
    out = iclm_pack(docs, F.col("n_tokens"), 200, nlist=4, dim=8)
    assert out.count() == 24
    assert out.filter(F.col("pack_id").isNull()).count() == 0
