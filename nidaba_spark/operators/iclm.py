"""In-context pretraining ordering (ICLM): pack RELATED documents
into the same training example instead of random neighbors.

Shi et al. 2023 ("In-Context Pretraining: Language Modeling Beyond
Document Boundaries") shows LMs improve when the documents
concatenated into one context window are semantically related — the
full method orders docs along an approximate traveling-salesman path
over embedding similarity. The scalable Spark re-expression here is
the standard cluster-then-concatenate approximation: assign every
document to an IVF cell (the distributed k-means already powering
ANN — operators/ivf.py), then pack with the global ordering
(cell, id) so each fixed-budget example draws its documents from one
semantic neighborhood (boundary packs straddle two cells at most).

Scale shape: centroid training is the IVF path (KB-scale matrices to
the driver, GEMM per Arrow batch); cell assignment is one Arrow-
batched projection; the ordering is the lexicographic (cell, id)
composite handed straight to ``packing.pack_assignments``'s
distributed prefix sum — ONE range shuffle of the slim
(cell, id, n_tokens) projection, never a global sort, never the
text. Ids may be any orderable type (strings, longs, ...).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ivf import _assign_udf, train_centroids
from .packing import pack_assignments


def assign_cells(
    vectors: DataFrame,
    centroids: np.ndarray,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) for every embedded doc — cosine-nearest centroid,
    Arrow-batched GEMM, no shuffle. Null embeddings are dropped here;
    ``iclm_pack`` routes them to the overflow cell instead."""
    return vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        _assign_udf(centroids, dim)(F.col(vec_col)).alias("cell"),
    )


def iclm_pack(
    docs: DataFrame,
    n_tokens: Column,
    budget: int,
    vectors: DataFrame | None = None,
    centroids: np.ndarray | None = None,
    nlist: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    npartitions: int | None = None,
) -> DataFrame:
    """Semantically-ordered sequence packing: (id, cell, n_tokens,
    tokens_before, pack_id, pack_pos) where the global packing order
    is (cell, id) — same-cell (≈ same-topic) documents are contiguous,
    so each pack's documents share a neighborhood (coherence and
    pack-arithmetic gates in tests/test_iclm.py).

    ``vectors`` holds the embeddings (defaults to ``docs`` itself —
    in which case ``vec_id_col`` follows ``id_col``, so the
    documented default works on a plain (doc_id, embedding) frame
    instead of demanding a 'vec_id' column that isn't there, review
    r05); pass precomputed ``centroids`` to reuse a trained index.
    Docs with no/null embedding land in the overflow cell ``nlist``
    (they pack together at the tail rather than polluting topical
    packs).
    """
    if vectors is None:
        vecs, vec_id_col = docs, id_col
    else:
        vecs = vectors
    if centroids is None:
        centroids = train_centroids(
            vecs, nlist=nlist, dim=dim, iters=iters, seed=seed,
            id_col=vec_id_col, vec_col=vec_col,
        )
    cells = assign_cells(
        vecs, centroids, dim=dim, id_col=vec_id_col, vec_col=vec_col
    ).withColumnRenamed(vec_id_col, id_col)
    slim = (
        docs.select(F.col(id_col), n_tokens.cast("long").alias("_n"))
        .join(cells, id_col, "left")
        .select(
            id_col,
            "_n",
            F.coalesce(F.col("cell"), F.lit(int(len(centroids)))).alias("cell"),
        )
    )
    packed = pack_assignments(
        slim,
        F.col("_n"),
        budget,
        order_col=["cell", id_col],
        npartitions=npartitions,
    )
    return packed.select(
        id_col, "cell", "n_tokens", "tokens_before", "pack_id", "pack_pos"
    )
