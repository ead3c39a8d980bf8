"""Similarity search over an embedding column (array<float>).

Training-data-pipeline component (driver instruction). Two paths:

  * brute_force_topk — exact cosine top-k: broadcast the (small) query
    set, score every corpus vector with JVM higher-order functions
    (zip_with + aggregate → dot product; no Python), rank with a
    per-query window. At 100 TB this is the correctness baseline and
    the right choice whenever |queries| is small (one scan, no index).
  * lsh_topk — random-hyperplane LSH: vectors are bucketed by a
    sign-bit sketch (deterministic pseudo-random planes derived from
    xxhash64, no stored model); candidates = same-bucket (or
    neighboring-probe) vectors; exact re-rank inside buckets. The
    scale path: the self-join shuffles only bucket keys.

Cosine uses l2-normalized dot; round(sim, 6) keeps comparisons stable
against the DuckDB oracle's float math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shr(col, n):
    return F.call_function("shiftright", col, n if isinstance(n, Column) else F.lit(n))


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With a static ``dim``, emit an unrolled sum of
    element_at products — plain expressions on the whole-stage-codegen
    fast path. The higher-order aggregate fallback (dynamic length) is
    CodegenFallback/interpreted — fine for one-off scoring, ~10-25x
    slower in a hot self-join."""
    if dim is not None:
        terms = [
            F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    # cast BEFORE multiplying: float*float stays FloatType (24-bit
    # rounding per product) while the unrolled dim path and the DuckDB
    # oracles multiply in double — the same function must not return
    # different values depending on whether dim was passed (review r05)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; a ZERO-norm side scores 0.0 against
    everything — 0/0 would be NaN, which Spark orders ABOVE every
    real number, so one failed/padded all-zero embedding would rank
    #1 for every query in the top-k windows (review r05; same
    contract as pq.py's null-embedding rule)."""
    denom = _norm(a, dim) * _norm(b, dim)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(
        _dot(a, b, dim) / denom
    )


def _cosine_prenorm(a: Column, b: Column, na: Column, nb: Column, dim: int | None) -> Column:
    """Cosine with the norms precomputed per side (same FP op order as
    cosine_sim, so values are bit-identical). Why: inlining dot + two
    unrolled norms into ONE post-join projection is ~192 unrolled
    terms at dim=64 — janino's 64KB method limit overflows and the
    whole stage silently drops to interpreted eval (observed in the
    r02 verify run). Computing each norm in its own pre-join
    projection keeps every codegen method small."""
    denom = na * nb
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(a, b, dim) / denom)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding).

    Broadcast-join the query set against the corpus scan — one pass,
    no shuffle of the big side; the only shuffle is the tiny
    per-query window rank. Norms are precomputed per side so the
    post-join projection stays under the codegen method limit
    (see _cosine_prenorm).
    """
    scored = vectors.select(
        F.col(id_col), F.col(vec_col).alias("_v"), _norm(F.col(vec_col), dim).alias("_nv")
    ).crossJoin(
        F.broadcast(
            queries.select(
                F.col(query_id_col),
                F.col(vec_col).alias("_q"),
                _norm(F.col(vec_col), dim).alias("_nq"),
            )
        )
    ).select(
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


def near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).

    Brute-force O(n^2) with an unrolled codegen'd dot — the exact
    baseline (oracle-checkable). At 10^9-vector scale swap in the LSH
    bucket prefilter (lsh_topk's _hyperplane_bits) so the self-join
    keys on buckets instead of the cross product. Norms are
    precomputed per side (n rows, not n^2 pairs) so the join-side
    projection stays under the codegen method limit
    (see _cosine_prenorm)."""
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_a"),
        _norm(F.col(vec_col), dim).alias("_na"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_b"),
        _norm(F.col(vec_col), dim).alias("_nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _cosine_prenorm(F.col("_a"), F.col("_b"), F.col("_na"), F.col("_nb"), dim), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def near_dup_pairs_lsh(
    vectors: DataFrame,
    threshold: float = 0.45,
    bands: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Near-dup pairs via banded hyperplane-LSH prefilter + exact verify
    — the scale path next to near_dup_pairs' exact O(n^2) baseline.

    Shape: one 64-bit sign sketch per vector (one projection pass, no
    shuffle), exploded into `bands` keys of `band_bits` bits; the
    self-join keys on (band, key) so it shuffles short keys and only
    compares within buckets; candidates are re-scored with the exact
    cosine, so precision is 1.0 by construction and the output is a
    subset of near_dup_pairs.

    Recall follows the banded S-curve 1-(1-p^r)^B with p =
    1-acos(sim)/pi: at r=4/B=16, sim 0.9 → ~1.0, sim 0.5 → ~0.97,
    sim 0.0 → 0.64 — i.e. the default prefilter is PERMISSIVE (built
    for mid-similarity thresholds like the 0.45 the exposed query
    uses; candidate rate is high). For production near-dup at
    threshold >= 0.85 set band_bits=8, bands=8: sim 0.9 → recall
    ~0.94 with a ~0.03 background candidate rate, which is what makes
    the join near-linear at 10^9 vectors. Measured recall is pinned in
    tests/test_lsh_recall.py.
    """
    assert bands * band_bits <= 64
    sk = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col), dim).alias("_n"),
        _hyperplane_bits(F.col(vec_col), bands * band_bits, dim).alias("sketch"),
    )
    cand = lsh_candidate_pairs(sk.select("id", "sketch"), bands, band_bits)
    va = sk.select(F.col("id").alias("id_a"), F.col("_v").alias("_a"), F.col("_n").alias("_na"))
    vb = sk.select(F.col("id").alias("id_b"), F.col("_v").alias("_b"), F.col("_n").alias("_nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _cosine_prenorm(F.col("_a"), F.col("_b"), F.col("_na"), F.col("_nb"), dim), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def lsh_candidate_pairs(sketched: DataFrame, bands: int, band_bits: int) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing any band key of the 64-bit
    sketch. Input: (id, sketch). Shared by near_dup_pairs_lsh and the
    recall/candidate-rate gates in tests/test_lsh_recall.py, so the
    measured candidate rate is the operator's, not a reimplementation's.
    The self-join keys on (band, key) — short ints, so at 10^9 vectors
    the shuffle moves ~16 bytes×bands per row, not the vectors."""
    mask = (1 << band_bits) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _shr(F.col("sketch"), b * band_bits).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(bands)
    ]
    keys = sketched.select(
        "id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", "bk.band", "bk.key")
    return (
        keys.alias("x")
        .join(
            keys.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


# Seed of the deterministic hyperplane matrix: fixed at module level so
# every executor, session, and round derives identical planes (the LSH
# "model" is this one constant — nothing to ship or persist).
_PLANES_SEED = 0x51C87

def _hyperplane_bits(vec: Column, nbits: int, dim: int) -> Column:
    """Sign sketch against nbits deterministic Gaussian hyperplanes,
    computed as ONE Arrow-batched numpy pass (vectorized pandas UDF).

    Why a pandas UDF and not Column expressions: the previous
    implementation nested F.aggregate(F.transform(...)) higher-order
    lambdas — CodegenFallback, interpreted — doing nbits*dim (4096 at
    64x64) boxed multiply-adds per row; measured 1,270 vectors/s/core
    at sf0.1 (VERDICT r02 "what's wrong" #2, same 25x pathology
    NOTES.md records for MinHash). Unrolling 4096 static terms instead
    would blow janino's 64KB method limit (192 terms already did). Here
    the whole batch is one BLAS matmul: (n, dim) @ (dim, nbits) then a
    packbits reduce — measured (local[32], sf0.1): 2,000-vector sketch
    pass 1.57s interpreted vs 0.34s; 200,000 vectors in 0.53s total,
    i.e. ~1M vectors/s marginal incl. Arrow transfer (~25x per core,
    and the surrounding stage stays on whole-stage codegen). The plane
    matrix is derived from a fixed seed
    (standard_normal — the textbook random-projection distribution), so
    any executor regenerates the same planes; closure pickling ships
    only the seed-derived 64x64 float64 array (32 KB).
    """
    from pyspark.sql.functions import pandas_udf

    planes_t = (
        np.random.RandomState(_PLANES_SEED)
        .standard_normal((nbits, dim))
        .T.copy()  # (dim, nbits), contiguous for the matmul
    )
    weights = np.left_shift(
        np.ones(nbits, dtype=np.uint64), np.arange(nbits, dtype=np.uint64)
    )

    @pandas_udf("long")
    def sketch(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        # null rows → null sketch (the behavior of the pre-r03 Column
        # expression; np.stack over a None raises — ADVICE r03): mask
        # them out of the matmul and re-emit as nullable Int64.
        valid = v.notna().to_numpy()
        words = np.zeros(len(v), dtype=np.int64)
        if valid.any():
            mat = np.stack(v.to_numpy()[valid]).astype(np.float64, copy=False)
            proj = mat @ planes_t
            words[valid] = (
                ((proj > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
            ).view(np.int64)
        out = pd.Series(words)
        if not valid.all():
            out = out.astype("Int64")
            out[~valid] = pd.NA
        return out

    return sketch(vec)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bands: int = 8,
    band_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: BANDED hyperplane LSH (multi-table) +
    exact re-rank of candidates.

    One 64-bit sign sketch per vector, split into `bands` independent
    tables of `band_bits` bits — a candidate needs to match the query
    in ANY one band (S-curve 1-(1-p^r)^B), and the query additionally
    probes every 1-bit-flip neighbor key within each band (hamming-1
    multi-probe), which roughly doubles per-band collision probability
    at moderate similarity. The r01 single-table nbits=8 variant
    measured recall@5 = 0.32 on the near-uniform synthetic embeddings
    (p^8 collapses when neighbors are barely above background); at
    r=8/B=8 + 1-bit probes the same corpus measures ~0.7 with a ~25%
    candidate rate. On real clustered embeddings (neighbors at sim
    >= 0.8, background near 0) the identical layout gives recall
    >= 0.95 with a few-percent candidate rate — tune bands/band_bits
    to the data regime, verify with the recall gate in
    tests/test_lsh_recall.py. The join shuffles only (band, key)
    shorts; candidates are deduped then exactly re-ranked."""
    nbits = bands * band_bits
    assert nbits <= 64
    mask = (1 << band_bits) - 1
    vb_base = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col), dim).alias("_nv"),
        _hyperplane_bits(F.col(vec_col), nbits, dim).alias("sketch"),
    )
    v_bands = [
        F.struct(
            F.lit(b).alias("band"),
            _shr(F.col("sketch"), b * band_bits).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(bands)
    ]
    vb = vb_base.select(
        id_col, "_v", "_nv", F.explode(F.array(*v_bands)).alias("bk")
    ).select(id_col, "_v", "_nv", F.col("bk.band").alias("band"), F.col("bk.key").alias("bucket"))
    q0 = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_q"),
        _norm(F.col(vec_col), dim).alias("_nq"),
        _hyperplane_bits(F.col(vec_col), nbits, dim).alias("sketch"),
    )
    # per band: exact key + all 1-bit-flip neighbor keys
    q_bands = []
    for b in range(bands):
        key = _shr(F.col("sketch"), b * band_bits).bitwiseAND(F.lit(mask))
        probe_keys = [key] + [
            key.bitwiseXOR(F.lit(1 << i)) for i in range(band_bits)
        ]
        q_bands += [
            F.struct(F.lit(b).alias("band"), pk.alias("key")) for pk in probe_keys
        ]
    qb = q0.select(
        query_id_col, "_q", "_nq", F.explode(F.array(*q_bands)).alias("bk")
    ).select(
        query_id_col, "_q", "_nq", F.col("bk.band").alias("band"), F.col("bk.key").alias("bucket")
    )
    scored = vb.join(F.broadcast(qb), ["band", "bucket"]).select(
        query_id_col,
        id_col,
        F.round(
            _cosine_prenorm(F.col("_v"), F.col("_q"), F.col("_nv"), F.col("_nq"), dim), 6
        ).alias("sim"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )
