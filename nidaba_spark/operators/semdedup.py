"""SemDeDup — semantic deduplication via embedding clustering
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The published recipe: k-means-cluster the corpus embeddings, compute
pairwise cosine similarity ONLY within each cluster, and keep one
representative per semantic-duplicate group. Clustering is what makes
web-scale semantic dedup tractable — the quadratic pair cost is
bounded by the largest CELL, not the corpus: n^2 becomes
sum_c |cell_c|^2, a (nlist)x reduction for balanced cells.

Spark composition (everything reused from this repo's ANN/dedup
stack):

* centroids: ivf.train_centroids — deterministic distributed Lloyd
  (GEMM assignment per Arrow batch, JVM avg update; only the
  nlist x dim matrix ever reaches the driver);
* assignment: the same vectorized Arrow UDF the IVF index uses;
* within-cell pairs: a self-EQUI-join on cell (one shuffle keyed by
  cell; AQE skew-split covers an unbalanced cell) with the unrolled
  codegen cosine of similarity.near_dup_pairs — norms precomputed per
  side so the join projection stays under the janino method limit;
* group resolution: cluster.connected_components (alternating
  large-star/small-star) over the dup pairs, keep-min-id per
  component — the same deterministic policy every dedup operator in
  this repo ships. (The paper explores centroid-distance keep
  policies; min-id is the reproducible choice and the tested
  invariant is the GROUPING, not the tiebreak.)

k-means is iterative, so there is no SQL oracle — the correctness
gates (tests/test_semdedup.py) pin: nlist=1 degenerates EXACTLY to
the oracle-checked brute-force near_dup_pairs; recall of cross-cell
true-dup pairs at realistic nlist; partitioning invariance; and the
keep-set arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import connected_components
from .ivf import _assign_udf, train_centroids
from .similarity import _cosine_prenorm, _norm


def semdedup_pairs(
    vectors: DataFrame,
    nlist: int = 16,
    dim: int = 64,
    threshold: float = 0.95,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cell, sim): within-cell cosine pairs >= threshold,
    id_a < id_b. The equi-join on cell is the paper's whole trick."""
    cents = train_centroids(
        vectors, nlist=nlist, dim=dim, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    from pyspark import StorageLevel

    # both self-join sides consume `assigned`; without materialization
    # the corpus scan + assignment GEMM + norm run TWICE (the same
    # no-common-subplan-reuse rule lm.py/dsir.py pin). localCheckpoint,
    # not persist — CacheManager canonicalized-plan aliasing.
    assigned = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("cell", _assign_udf(cents, dim)("_v"))
        .withColumn("_n", _norm(F.col("_v"), dim))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    a = assigned.select(
        F.col("_id").alias("id_a"), "cell",
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = assigned.select(
        F.col("_id").alias("id_b"), "cell",
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "cell",
            F.round(
                _cosine_prenorm(
                    F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), dim
                ),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semdedup(
    vectors: DataFrame,
    nlist: int = 16,
    dim: int = 64,
    threshold: float = 0.95,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, rep): one row per vector that belongs to a semantic-
    duplicate group, rep = the group's min id (the kept member).
    Consumers drop rows where vec_id != rep; vectors absent from the
    output are singletons and are always kept."""
    pairs = semdedup_pairs(
        vectors, nlist, dim, threshold, iters, seed, id_col, vec_col
    ).select(F.col("id_a"), F.col("id_b"))
    return connected_components(pairs).select(
        F.col("node").alias("vec_id"), "rep"
    )
