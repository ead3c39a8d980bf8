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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shl(col, n):
    """shiftleft with a Column bit count (the pyspark wrapper only takes int)."""
    return F.call_function("shiftleft", col, n if isinstance(n, Column) else F.lit(n))


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
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


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
    per-query window rank.
    """
    scored = vectors.select(
        F.col(id_col), F.col(vec_col).alias("_v")
    ).crossJoin(
        F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("_q")))
    ).select(
        query_id_col,
        id_col,
        F.round(cosine_sim(F.col("_v"), F.col("_q"), dim), 6).alias("sim"),
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
    keys on buckets instead of the cross product."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_sim(F.col("_a"), F.col("_b"), dim), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _hyperplane_bits(vec: Column, nbits: int, dim: int) -> Column:
    """Sign sketch against nbits deterministic pseudo-random hyperplanes.

    Plane p's component j = (xxhash64(p*dim+j) % 1000003) / 1000003 - 0.5
    — a fixed, data-independent pseudo-random matrix computed inline in
    JVM expressions (no model state to ship; any executor derives the
    same planes).
    """
    def plane_component(p: Column, j: Column) -> Column:
        h = F.xxhash64(p * dim + j)
        return (F.pmod(h, F.lit(1000003)).cast("double") / 1000003.0) - 0.5

    def bit_for_plane(p: Column) -> Column:
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        proj = F.aggregate(
            F.zip_with(vec, idx, lambda v, j: (v.cast("double") * plane_component(p, j))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, _shl(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))

    return F.aggregate(
        F.transform(F.sequence(F.lit(0), F.lit(nbits - 1)), bit_for_plane),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH bucket join + exact
    re-rank within candidate buckets (multi-probe: query also probes
    all 1-bit-flip neighbor buckets to cut misses)."""
    vb = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _hyperplane_bits(F.col(vec_col), nbits, dim).alias("bucket"),
    )
    q0 = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_q"),
        _hyperplane_bits(F.col(vec_col), nbits, dim).alias("b0"),
    )
    probes = F.concat(
        F.array(F.col("b0")),
        F.transform(
            F.sequence(F.lit(0), F.lit(nbits - 1)),
            lambda i: F.col("b0").bitwiseXOR(_shl(F.lit(1).cast("long"), i)),
        ),
    )
    qb = q0.select(query_id_col, "_q", F.explode(probes).alias("bucket"))
    from pyspark.sql import Window

    scored = vb.join(F.broadcast(qb), "bucket").select(
        query_id_col,
        id_col,
        F.round(cosine_sim(F.col("_v"), F.col("_q"), dim), 6).alias("sim"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )
