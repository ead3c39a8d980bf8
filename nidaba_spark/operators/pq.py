"""Product quantization (PQ) for embedding compression + ANN search.

The third leg of the similarity-search scale story (beside the
hash-structured ann_lsh and the index-structured ivf): at 10^12
vectors the embeddings themselves are the storage/IO problem — a
64-dim float32 vector is 256 B, while its PQ code here is m=8 BYTES
(32× compression). Jégou, Douze & Schmid 2011, "Product Quantization
for Nearest Neighbor Search": split each vector into m subspaces,
k-means each subspace into ksub codewords, store only the m codeword
ids; query-time ADC (asymmetric distance computation) scores a code
against a query with m table lookups into a per-query (m, ksub)
dot-product table — the corpus floats are never touched again.

Spark-first layout:

* Codebook training (``train_pq_codebooks``) keeps the corpus
  distributed and shuffles ONE combined update per Lloyd iteration:
  a pandas UDF assigns all m sub-codes per vector in one reshaped
  batch einsum, then posexplode(codes) keys the update by
  (subspace, code) so a single map-side-combined groupBy carries all
  m×ksub×dsub partial sums — only the (m, ksub, dsub) codebook tensor
  (KB) reaches the driver per iteration, mirroring operators/ivf.py.
* Encoding (``encode_pq``) is the same batched einsum, emitting
  ``array<int>`` codes — at production scale this column (plus the
  stored vector norm) is what you persist; the float vectors stay in
  cold storage for the optional re-rank only.
* Search (``pq_topk``) broadcasts the per-query ADC tables (numpy,
  nq×m×ksub floats) into one mapInPandas over the coded corpus; each
  batch emits only its per-query local top-shortlist (nq × shortlist
  rows per batch, never n×nq), then a global window takes the
  shortlist and an exact re-rank joins the true vectors back for the
  final top-k — FAISS's IndexIVFPQ + refine pattern. Scoring is
  ``LUT[:, codes].sum`` — pure numpy gathers, no per-row Python.

Determinism: seeded hash-ordered init, fixed iterations, codebooks
rounded to 6 dp per iteration (F.avg last-ulp order noise), stable
argsorts, id tiebreaks. Null embeddings encode as zero vectors (cosine
0 against everything), matching operators/ivf._as_matrix.

Gates (tests/test_pq.py): train/encode determinism, code-range
validity, ADC+re-rank recall vs brute force on the embeddings table,
planted-cluster recall, and the compression arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ivf import _as_matrix
from .similarity import _cosine_prenorm, _norm


def _encode_udf(codebooks: np.ndarray, dim: int):
    """pandas UDF: vec -> array<int> of m sub-codes.

    One reshaped einsum per Arrow batch: (n, m, dsub) x (m, ksub, dsub)
    -> (n, m, ksub) similarities, argmax over ksub. Euclidean argmin
    == dot-argmax after subtracting half the codeword norms (ties to
    the lowest code id via stable argmax)."""
    from pyspark.sql.functions import pandas_udf

    m, ksub, dsub = codebooks.shape
    # precompute -0.5*||c||^2 term so argmax(dot + term) == argmin L2
    half_sq = 0.5 * np.einsum("mkd,mkd->mk", codebooks, codebooks)

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        mat = _as_matrix(v, dim).reshape(len(v), m, dsub)
        sims = np.einsum("nmd,mkd->nmk", mat, codebooks) - half_sq[None, :, :]
        codes = np.argmax(sims, axis=2).astype(np.int32)
        return pd.Series([row.tolist() for row in codes])

    return encode


def _qmat(qrows, vec_col: str, dim: int) -> np.ndarray:
    """(nq, dim) float64 query matrix — null embeddings become zero
    rows, and an EMPTY batch yields shape (0, dim) so every axis-1
    reduction downstream stays valid (review r05: np.array([]) is
    1-D and crashed norm/einsum on empty query batches)."""
    out = np.zeros((len(qrows), dim), dtype=np.float64)
    for i, r in enumerate(qrows):
        if r[vec_col] is not None:
            out[i] = [float(x) for x in r[vec_col]]
    return out


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed per-subspace k-means; returns the
    (m, ksub, dsub) float64 codebook tensor."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    init_rows = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
        .orderBy("_h")
        .limit(ksub)
        .collect()
    )
    if len(init_rows) < ksub:
        raise ValueError(f"corpus has fewer than ksub={ksub} vectors")
    sample = np.array(
        [[float(x) for x in r[vec_col]] for r in init_rows], dtype=np.float64
    )
    # subspace s's initial codewords = the sample's s-th slices
    books = np.ascontiguousarray(
        sample.reshape(ksub, m, dsub).transpose(1, 0, 2)
    )
    slim = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).alias("_v")
    )
    dsub_means = [
        F.avg(F.col("_sv").getItem(i).cast("double")).alias(f"m{i}")
        for i in range(dsub)
    ]
    for _ in range(iters):
        coded = slim.withColumn("_codes", _encode_udf(books, dim)("_v"))
        # ONE shuffle updates all m codebooks: key = (subspace, code),
        # payload = the dsub-dim subvector slice
        exploded = coded.select(
            "_v", F.posexplode("_codes").alias("sub", "code")
        ).select(
            "sub",
            "code",
            F.slice(
                F.col("_v"), F.col("sub") * dsub + F.lit(1), F.lit(dsub)
            ).alias("_sv"),
        )
        rows = exploded.groupBy("sub", "code").agg(*dsub_means).collect()
        nxt = books.copy()  # empty codes keep their previous codeword
        for r in rows:
            nxt[r["sub"], r["code"]] = [r[f"m{i}"] for i in range(dsub)]
        books = np.round(nxt, 6)
    return books


def encode_pq(
    vectors: DataFrame,
    codebooks: np.ndarray,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(id, codes array<int>, vnorm[, cell]) — the persisted PQ index
    columns; pass ``centroids`` to append the IVF cell assignment.
    vnorm rides along so ADC cosine needs no float-vector access."""
    cols = [
        F.col(id_col),
        _encode_udf(codebooks, dim)(F.col(vec_col)).alias("codes"),
        # null embedding -> vnorm 0 (NOT null): a null vnorm becomes NaN
        # in the Arrow batch and NaN ADC scores sort ABOVE every real
        # double under F.desc, stealing shortlist slots (ADVICE r04).
        # Zero-norm rows are masked out of ADC scoring downstream.
        F.coalesce(F.round(_norm(F.col(vec_col), dim), 6), F.lit(0.0)).alias("vnorm"),
    ]
    if centroids is not None:
        from .ivf import _assign_udf

        cols.append(_assign_udf(centroids, dim)(F.col(vec_col)).alias("cell"))
    return vectors.select(*cols)


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ (FAISS IndexIVFPQ + refine): the two pruning axes
    composed — the coarse quantizer prunes (nlist-nprobe)/nlist of
    the CELLS before any scoring, and within probed cells the ADC
    tables score m-byte codes instead of float vectors. At 10^12 rows
    the coded table is written partitioned BY cell (the
    sources/iceberg.py scheme), so a query touches nprobe partitions
    of 8-byte-code rows and the float corpus only for the
    shortlist×nq re-rank.

    Plan: probed (query, cell) pairs broadcast-join the coded corpus
    on its int cell key → one scalar pandas UDF computes the ADC
    gather per joined row batch (query index → its LUT row) → global
    per-query shortlist window → exact re-rank. Training reuses
    ivf.train_centroids (coarse) and train_pq_codebooks (fine);
    pass both to reuse a persisted index."""
    from .ivf import _probe_udf, train_centroids

    if centroids is None:
        centroids = train_centroids(
            vectors, nlist=nlist, dim=dim, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    if codebooks is None:
        codebooks = train_pq_codebooks(
            vectors, m=m, ksub=ksub, dim=dim, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    m, ksub, _dsub = codebooks.shape
    # the persisted IVF-PQ index row: (id, m-byte codes, norm, cell)
    coded = encode_pq(vectors, codebooks, dim, id_col, vec_col, centroids=centroids)

    short = _ivfpq_shortlist(
        coded, queries, centroids, codebooks, nprobe, shortlist, dim,
        id_col, vec_col, query_id_col,
    )
    return _exact_rerank(
        short, vectors, queries, k, dim, id_col, vec_col, query_id_col
    )


def _ivfpq_shortlist(
    coded: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    nprobe: int,
    shortlist: int,
    dim: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Probed-cell broadcast join + ADC scoring + per-query shortlist
    over a coded table (id, codes, vnorm, cell) — shared by the inline
    (ivfpq_topk) and persisted-index (ivfpq_topk_index) paths."""
    from .ivf import _probe_udf

    m, ksub, _dsub = codebooks.shape
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[query_id_col] for r in qrows]
    qindex = {qid: i for i, qid in enumerate(qids)}
    qmat = _qmat(qrows, vec_col, dim)
    qnorm = np.maximum(np.linalg.norm(qmat, axis=1), 1e-12)
    lut_flat = np.einsum(
        "qmd,mkd->qmk", qmat.reshape(len(qids), m, dim // m), codebooks
    ).reshape(len(qids), m * ksub)
    sub_off = np.arange(m) * ksub

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def adc(qid: pd.Series, codes: pd.Series, vnorm: pd.Series) -> pd.Series:
        if len(qid) == 0:
            return pd.Series([], dtype="float64")
        qi = qid.map(qindex).to_numpy(dtype=np.int64)
        c = np.array(codes.tolist(), dtype=np.int64) + sub_off[None, :]
        sims = np.take_along_axis(lut_flat[qi], c, axis=1).sum(axis=1)
        vraw = vnorm.to_numpy(dtype=np.float64)
        v = np.maximum(vraw, 1e-12)
        out = np.round(sims / (v * qnorm[qi]), 6)
        # zero/NaN-norm docs (null embeddings): -inf so they sort LAST
        # under F.desc('adc') — the docstring's 'cosine 0 against
        # everything' contract, not shortlist-stealing NaNs (ADVICE r04)
        out[~(np.isfinite(vraw) & (vraw > 0))] = -np.inf
        return pd.Series(out)

    qprobe = queries.select(
        F.col(query_id_col),
        _probe_udf(centroids, dim, nprobe)(F.col(vec_col)).alias("_cells"),
    ).select(query_id_col, F.explode("_cells").alias("cell"))
    scored = coded.join(F.broadcast(qprobe), "cell").select(
        query_id_col,
        id_col,
        adc(F.col(query_id_col), F.col("codes"), F.col("vnorm")).alias("adc"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("adc"), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= shortlist)
        .drop("_rn", "adc")
    )


def _exact_rerank(
    short: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """True-cosine re-rank of a (query_id, id) shortlist (shared by
    pq_topk and ivfpq_topk): floats are joined back for shortlist×nq
    rows only."""
    corpus = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col), dim).alias("_nv"),
    )
    qdf = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_q"),
        _norm(F.col(vec_col), dim).alias("_nq"),
    )
    rescored = (
        short.join(corpus, id_col)
        .join(F.broadcast(qdf), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                _cosine_prenorm(
                    F.col("_v"), F.col("_q"), F.col("_nv"), F.col("_nq"), dim
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC cosine top-k with exact re-rank (FAISS refine pattern).

    Stage 1 scans only the coded corpus: per Arrow batch, every
    query's ADC score is ``LUT[q][sub, codes[sub]].sum() / vnorm`` and
    only the per-query batch-local top-``shortlist`` rows are emitted.
    Stage 2 takes the global shortlist per query (window) and re-ranks
    it exactly by joining the true vectors back — the float corpus is
    touched for shortlist×nq rows, not n×nq.

    Pass precomputed ``codebooks`` to reuse a trained index
    (production: train once on a hash-sample, persist the tensor with
    the coded table)."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            vectors, m=m, ksub=ksub, dim=dim, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    m, ksub, _dsub = codebooks.shape
    coded = encode_pq(vectors, codebooks, dim, id_col, vec_col)

    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[query_id_col] for r in qrows]
    qmat = _qmat(qrows, vec_col, dim)
    qnorm = np.maximum(np.linalg.norm(qmat, axis=1), 1e-12)
    # per-query ADC tables: LUT[q, sub, code] = dot(q_sub, codeword)
    lut = np.einsum(
        "qmd,mkd->qmk", qmat.reshape(len(qids), m, dim // m), codebooks
    )

    # id field types come from the INPUT schemas, not a hardcoded long:
    # string/int ids would otherwise fail or silently coerce in the
    # mapInPandas stage (ADVICE r04; ivfpq_topk preserves types via join)
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    id_t = vectors.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id_col} {qid_t}, {id_col} {id_t}, adc double"

    lut_flat = lut.reshape(len(qids), m * ksub)

    def score_batches(it):
        for pdf in it:
            if not qids:
                continue
            # drop zero/NaN-norm docs (null embeddings) BEFORE scoring:
            # their ADC would be NaN/garbage and NaN sorts above every
            # real double under desc (ADVICE r04); contract is cosine 0
            vraw = pdf["vnorm"].to_numpy(dtype=np.float64)
            ok = np.isfinite(vraw) & (vraw > 0)
            if not ok.all():
                pdf = pdf[ok]
            n = len(pdf)
            if n == 0:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            vnorm = np.maximum(pdf["vnorm"].to_numpy(dtype=np.float64), 1e-12)
            # flat gather: (nq, n, m) lookups -> sum over m -> (nq, n)
            flat = codes + np.arange(m)[None, :] * ksub
            sims = lut_flat[:, flat].sum(axis=2)
            sims = sims / (vnorm[None, :] * qnorm[:, None])
            take = min(n, shortlist)
            ids = pdf[id_col].to_numpy()
            # batch-local top-shortlist per query with id tiebreak, so
            # the local cut is deterministic for a given batch content
            # (ties crossing batch boundaries are resolved by the
            # global window; the exact re-rank absorbs the residue)
            parts = []
            for qi, qid in enumerate(qids):
                order = np.lexsort((ids, -sims[qi]))[:take]
                parts.append(
                    pd.DataFrame(
                        {
                            query_id_col: qid,
                            id_col: ids[order],
                            "adc": np.round(sims[qi][order], 6),
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    candidates = coded.mapInPandas(score_batches, schema=out_schema)
    wq = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc"), F.col(id_col)
    )
    short = (
        candidates.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= shortlist)
        .drop("_rn", "adc")
    )
    return _exact_rerank(
        short, vectors, queries, k, dim, id_col, vec_col, query_id_col
    )


# ---------------------------------------------------------------------
# persisted IVF-PQ index: the vector twin of the partitioned BM25
# postings (operators/search.py) — train once, write the coded table
# PARTITIONED BY cell, serve queries that read only their probed
# cells' partitions (PartitionFilters, plan-asserted in
# tests/test_pq.py).
# ---------------------------------------------------------------------
def build_ivfpq_index(
    vectors: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int = 0,
) -> None:
    """Train the coarse quantizer + PQ codebooks and persist:

      {path}/coded/batch=0/cell=<c>/...  (id, codes array<int>, vnorm)
                                  — 8-byte codes + one double per
                                  vector, 32x smaller than the floats;
      {path}/model/centroids      (row, vec array<double>);
      {path}/model/codebooks      (subspace, code, vec array<double>).

    The model tables are KBs regardless of corpus size (nlist x dim +
    m x ksub x dsub doubles); the coded table is the only
    corpus-sized artifact and its cell partitioning is what lets a
    query prune (nlist - nprobe)/nlist of it at the SCAN. The batch=
    level makes the index APPENDABLE (append_ivfpq encodes new rows
    with THIS persisted model into their own batch subdirectory —
    queries read cells across all batches) and each batch write an
    idempotent overwrite of its own subdirectory. A rebuild overwrites
    batch 0 only; wipe ``{path}/coded`` first for a from-scratch
    build over a previously-appended index."""
    from .ivf import train_centroids

    spark = vectors.sparkSession
    centroids = train_centroids(
        vectors, nlist=nlist, dim=dim, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    codebooks = train_pq_codebooks(
        vectors, m=m, ksub=ksub, dim=dim, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    coded = encode_pq(vectors, codebooks, dim, id_col, vec_col, centroids=centroids)
    # batch_id parameterized so a streaming bootstrap whose first drop
    # arrives as micro-batch N != 0 stays batch-keyed (replay converges
    # to the same subdirectory, never a second copy under batch=0)
    coded.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/coded/batch={batch_id}"
    )
    spark.createDataFrame(
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "row int, vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/model/centroids")
    mm, kk, _ = codebooks.shape
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in codebooks[s, c]])
            for s in range(mm)
            for c in range(kk)
        ],
        "subspace int, code int, vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/model/codebooks")


def append_ivfpq(
    vectors: DataFrame,
    path: str,
    batch_id: int,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add one ingest batch to a build_ivfpq_index directory: encode
    the new rows with the PERSISTED model (no retraining — the cell
    geometry and codebooks must stay fixed or historical codes become
    incomparable) and overwrite ``coded/batch=<id>`` idempotently (a
    crash-replayed batch converges; same pattern as search
    .append_postings). Ids must be unique across batches — upstream
    recrawl-dedup owns that. Per-batch cost is one scan of the BATCH;
    historical vectors are never touched. Quantization-drift policy
    is the caller's: when the data distribution moves, rebuild the
    model and re-encode (compact_coded collapses the batch layout
    first so the rebuild starts from one directory listing)."""
    spark = vectors.sparkSession
    centroids, codebooks = load_ivfpq_model(spark, path)
    # the persisted model is the single source of truth for geometry:
    # a dim that disagrees with it would corrupt every code written
    model_dim = int(centroids.shape[1])
    if dim is not None and dim != model_dim:
        raise ValueError(
            f"append dim={dim} != persisted model dim={model_dim} at {path}"
        )
    coded = encode_pq(
        vectors, codebooks, model_dim, id_col, vec_col, centroids=centroids
    )
    coded.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/coded/batch={batch_id}"
    )


def compact_coded(spark, path: str) -> dict:
    """Collapse every ``coded/batch=N`` of an appended IVF-PQ index
    into a single ``batch=0`` with ~one file per cell — the same
    small-files repair as search.compact_postings, and the same swap
    protocol (fully write under ``.compacting/``, rename the live dir
    aside, rename the new one in; nothing deleted until the swap
    lands). Codes are per-id rows, so compaction is a pure
    repartition-by-cell rewrite — scores are byte-identical."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def jp(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = jp(path).getFileSystem(conf)

    def count_files(sub):
        it, n = fs.listFiles(jp(f"{path}/{sub}"), True), 0
        while it.hasNext():
            n += it.next().getPath().getName().endswith(".parquet")
        return n

    batches = [
        s.getPath().getName()
        for s in fs.listStatus(jp(f"{path}/coded"))
        if s.getPath().getName().startswith("batch=")
    ]
    files_before = count_files("coded")
    coded = spark.read.parquet(f"{path}/coded")
    ncells = coded.select("cell").distinct().count()
    tmp = f"{path}/.compacting"
    fs.delete(jp(tmp), True)
    (
        coded.drop("batch")
        .repartition(max(int(ncells), 1), "cell")
        .write.partitionBy("cell")
        .parquet(f"{tmp}/coded/batch=0")
    )
    old = f"{path}/.compact_old"
    fs.delete(jp(old), True)
    fs.mkdirs(jp(old))
    if not fs.rename(jp(f"{path}/coded"), jp(f"{old}/coded")):
        raise OSError("compaction swap failed moving coded aside")
    fs.mkdirs(jp(f"{path}/coded"))
    if not fs.rename(jp(f"{tmp}/coded/batch=0"), jp(f"{path}/coded/batch=0")):
        raise OSError(
            f"compaction swap failed installing coded; originals "
            f"preserved under {old}"
        )
    fs.delete(jp(old), True)
    fs.delete(jp(tmp), True)
    return {
        "batches_before": len(batches),
        "coded_files_before": files_before,
        "coded_files_after": count_files("coded"),
    }


def load_ivfpq_model(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) back from {path}/model — KB-scale reads."""
    crows = spark.read.parquet(f"{path}/model/centroids").collect()
    centroids = np.array(
        [r["vec"] for r in sorted(crows, key=lambda r: r["row"])],
        dtype=np.float64,
    )
    brows = spark.read.parquet(f"{path}/model/codebooks").collect()
    m = 1 + max(r["subspace"] for r in brows)
    ksub = 1 + max(r["code"] for r in brows)
    dsub = len(brows[0]["vec"])
    codebooks = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in brows:
        codebooks[r["subspace"], r["code"]] = r["vec"]
    return centroids, codebooks


def ivfpq_topk_index(
    spark,
    path: str,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    shortlist: int = 50,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Serve ANN queries from a build_ivfpq_index directory.

    The union of the query batch's probed cells becomes a LITERAL
    partition predicate on the coded scan — Spark lists and reads
    ONLY those cell=<c> directories (PartitionFilters), so the scan
    cost is (nprobe/nlist) x corpus codes no matter the corpus size.
    The driver-side probe replicates ivf._probe_udf's math exactly
    (cosine argsort, stable ties), so results are identical to the
    inline ivfpq_topk with the same model. ``vectors`` supplies the
    float rows for the exact re-rank only (shortlist x nq lookups —
    at 10^12 scale, a point-lookup table keyed by id)."""
    centroids, codebooks = load_ivfpq_model(spark, path)
    qrows = queries.select(query_id_col, vec_col).collect()
    qmat = _qmat(qrows, vec_col, dim)
    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    npb = min(nprobe, len(centroids))
    top = np.argsort(-(qmat @ cnorm.T), axis=1, kind="stable")[:, :npb]
    cells = sorted({int(c) for row in top for c in row})
    coded = spark.read.parquet(f"{path}/coded").filter(
        F.col("cell").isin(cells) if cells else F.lit(False)
    )
    short = _ivfpq_shortlist(
        coded, queries, centroids, codebooks, nprobe, shortlist, dim,
        id_col, vec_col, query_id_col,
    )
    return _exact_rerank(
        short, vectors, queries, k, dim, id_col, vec_col, query_id_col
    )
