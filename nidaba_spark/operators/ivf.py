"""IVF (inverted-file) approximate nearest-neighbor search.

Training-data-pipeline component: the index-structured ANN scale path
beside similarity.lsh_topk (hash-structured) and
similarity.brute_force_topk (exact baseline). IVF is the classic
coarse-quantizer design (Sivic & Zisserman's Video Google inverted
file; FAISS IndexIVFFlat): partition the corpus into `nlist` Voronoi
cells around k-means centroids, then answer a query by scanning only
the `nprobe` cells whose centroids are nearest — a recall/throughput
dial that LSH's fixed hash layout doesn't give you.

Spark-first layout:

  * Training (Lloyd iterations) keeps the corpus distributed: the
    assignment step is one NumPy GEMM per Arrow batch (vectorized
    pandas UDF — the similarity._hyperplane_bits lesson: never
    per-element Column expressions for dense linear algebra), and the
    centroid-update step is `dim` JVM-side F.avg aggregates grouped by
    cell — whole-stage-codegen'd, map-side partial aggregation, one
    shuffle of nlist×dim partial sums per iteration. Only the
    nlist×dim centroid matrix (a few KB) ever reaches the driver,
    exactly like Spark MLlib's own KMeans.
  * Init is a deterministic hash-ordered sample (the nlist smallest
    xxhash64(id, seed) — a seeded uniform draw without an RNG); k-means||
    would cost extra passes for little gain at the nlist scales IVF
    uses. Empty cells keep their previous centroid (deterministic).
  * Search broadcasts the probed (query, cell) pairs against the
    cell-assigned corpus: the big side joins on its int cell key — at
    10^12-row scale you WRITE the assigned table bucketed/partitioned
    BY cell (sources/iceberg.py scheme), so probing nprobe of nlist
    cells prunes (nlist - nprobe)/nlist of the scan before any
    shuffle. Exact cosine re-rank inside probed cells (same
    _cosine_prenorm codegen path as the brute-force baseline), so
    precision within returned candidates is exact by construction.

Determinism: seeded init + fixed iteration count + float64 centroid
math → identical centroids on every run and any partitioning
(F.avg over float64 is order-sensitive in the last ulps, so centroids
are rounded to 6 decimals each iteration to pin cross-run identity;
assignment ties break on the lower cell id via argmax-first-wins).

Recall is gated in tests/test_ivf.py: exhaustive probe (nprobe =
nlist) must equal brute force exactly; partial probe carries a
planted-cluster recall floor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _cosine_prenorm, _norm


def _as_matrix(v: pd.Series, dim: int) -> np.ndarray:
    """Stack an Arrow list<float> Series into (n, dim) float64, null-safe
    (null embeddings become zero rows — cosine 0 against everything)."""
    valid = v.notna().to_numpy()
    out = np.zeros((len(v), dim), dtype=np.float64)
    if valid.any():
        out[valid] = np.stack(v.to_numpy()[valid]).astype(np.float64, copy=False)
    return out


def _assign_udf(centroids: np.ndarray, dim: int):
    """pandas UDF: vec -> nearest-centroid cell id (cosine argmax).

    One GEMM per Arrow batch against the broadcast (nlist, dim)
    normalized-centroid matrix; the vector's own norm never changes
    the argmax so only centroids are normalized.
    """
    from pyspark.sql.functions import pandas_udf

    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        mat = _as_matrix(v, dim)
        # (n, dim) @ (dim, nlist) — ties resolve to the lowest cell id
        return pd.Series(np.argmax(mat @ cnorm.T, axis=1).astype(np.int32))

    return assign


def _probe_udf(centroids: np.ndarray, dim: int, nprobe: int):
    """pandas UDF: query vec -> the nprobe nearest cell ids (array<int>)."""
    from pyspark.sql.functions import pandas_udf

    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    nprobe = min(nprobe, len(centroids))

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        mat = _as_matrix(v, dim)
        sims = mat @ cnorm.T
        # argsort on (-sim, cell) — deterministic order, stable ties
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    return probe


def train_centroids(
    vectors: DataFrame,
    nlist: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed k-means (cosine assignment, mean
    update). Returns the (nlist, dim) float64 centroid matrix — the
    only data that ever leaves the executors (a few KB per iteration,
    like MLlib KMeans)."""
    # init: nlist rows with the smallest xxhash64(id, seed) — a seeded
    # uniform sample with no RNG state, reproducible on any partitioning
    init_rows = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
        .orderBy("_h")
        .limit(nlist)
        .collect()
    )
    cents = np.array(
        [[float(x) for x in r[vec_col]] for r in init_rows], dtype=np.float64
    )
    if len(cents) < nlist:
        raise ValueError(f"corpus has fewer than nlist={nlist} vectors")
    slim = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).alias("_v")
    )
    for _ in range(iters):
        assigned = slim.withColumn("cell", _assign_udf(cents, dim)("_v"))
        # centroid update: dim JVM avg aggs — map-side partial agg,
        # shuffle payload = nlist x dim partial sums, codegen'd
        mean_cols = [
            F.avg(F.col("_v").getItem(i).cast("double")).alias(f"m{i}")
            for i in range(dim)
        ]
        rows = assigned.groupBy("cell").agg(*mean_cols).collect()
        nxt = cents.copy()  # empty cells keep their previous centroid
        for r in rows:
            nxt[r["cell"]] = [r[f"m{i}"] for i in range(dim)]
        # pin cross-run identity: avg over float64 is order-sensitive
        # in the last ulps; 6 decimals is far coarser than that noise
        cents = np.round(nxt, 6)
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k per query.

    Pass precomputed `centroids` to reuse a trained index across
    calls (production: train once on a hash-sample, persist the
    matrix, write the assigned table partitioned by cell)."""
    if centroids is None:
        centroids = train_centroids(
            vectors, nlist=nlist, dim=dim, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    assigned = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col), dim).alias("_nv"),
        _assign_udf(centroids, dim)(vec_col).alias("cell"),
    )
    qprobe = (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_q"),
            _norm(F.col(vec_col), dim).alias("_nq"),
            _probe_udf(centroids, dim, nprobe)(vec_col).alias("_cells"),
        )
        .select(query_id_col, "_q", "_nq", F.explode("_cells").alias("cell"))
    )
    scored = assigned.join(F.broadcast(qprobe), "cell").select(
        query_id_col,
        id_col,
        F.round(
            _cosine_prenorm(F.col("_v"), F.col("_q"), F.col("_nv"), F.col("_nq"), dim), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )
