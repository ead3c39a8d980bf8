"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Selects raw-corpus documents that look like a small TARGET corpus
(the Wikipedia/books proxy in the paper) by importance weighting in a
hashed n-gram feature space:

    features(doc) = unigrams + bigrams, each hashed into one of B
                    buckets (B fixed, default 10,000)
    log w(doc)    = sum over the doc's feature OCCURRENCES of
                    log p_target(bucket) - log p_raw(bucket)
    selection     = Gumbel top-k over log w (importance resampling
                    without replacement — the paper's sampler)

where p_*(bucket) are Laplace-smoothed bucket unigram models,
(c_b + 1) / (N + B).

Why this is the 10^12-row shape — the whole point of hashing into a
FIXED B is that both models are forever broadcast-sized:

* feature extraction is the linear-time projected-array gram build
  (operators/lm.doc_bigrams + an exploded unigram pass — no inlined
  tokenizer in any lambda);
* per-doc bucket counts: one groupBy(doc_id, bucket) whose map-side
  combine collapses repeated features before the only exchange; the
  bucket axis of the key is uniform BY CONSTRUCTION (md5), so there
  is no zipf-head skew to handle — the hash destroys it;
* the delta table (one row per bucket, <= B rows) comes from two
  bucket-count aggregations whose results are B-bounded, joined
  full-outer and BROADCAST into the scoring join — the scoring path
  is scan -> partial agg -> one exchange -> broadcast lookup -> final
  agg, with zero large-side shuffle joins;
* Gumbel top-k never sorts globally: the k-th (score, doc_id) pair
  comes from a TakeOrdered(k) (orderBy+limit — Spark plans this as a
  per-partition top-k + driver merge of k*P rows, no SinglePartition
  window), broadcast back as two literals; the keep predicate is then
  a pure row-local comparison.

Cross-engine exactness (the DuckDB oracle runs the identical
arithmetic): bucket ids and the Gumbel uniform come from the md5
idiom this repo already mirrors in SQL (mixing.uniform_hash /
split_assign's oracle); per-bucket log-ratio deltas and the Gumbel
noise are quantized to integer MILLIONTHS before any aggregation, so
document scores are exact integer sums — float summation order can
never flip a rank.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .filters import _words
from .lm import doc_bigrams

N_BUCKETS = 10_000
_U32 = float(1 << 32)


def _hash32(s: Column) -> Column:
    """First 8 hex chars of md5 as a non-negative 32-bit int — the
    repo's cross-engine hash (same strpos arithmetic in the oracles)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def bucket_of(feature: Column, n_buckets: int = N_BUCKETS) -> Column:
    return F.pmod(_hash32(feature), F.lit(n_buckets))


def doc_feature_counts(
    docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, k): hashed unigram+bigram occurrence counts.
    One map-side-combined aggregation; bucket keys are md5-uniform, so
    the exchange is skew-free by construction."""
    uni = docs.select(
        F.col(id_col).alias("doc_id"),  # long or string url, preserved
        F.explode(_words(F.col(text_col))).alias("f"),
    )
    bi = doc_bigrams(docs, text_col, id_col).select(
        "doc_id", F.concat_ws(" ", "w1", "w2").alias("f")
    )
    feats = uni.unionByName(bi)
    return (
        feats.select("doc_id", bucket_of(F.col("f"), n_buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )


def _bucket_model(feature_counts: DataFrame) -> DataFrame:
    """(bucket, c): corpus-wide bucket counts — at most B rows out."""
    return feature_counts.groupBy("bucket").agg(F.sum("k").alias("c"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, logw_micro): per-raw-doc importance log-weight
    in integer millionths (log10), higher = more target-like."""
    from pyspark import StorageLevel

    # raw_fc feeds BOTH the raw model and the scoring join, and each
    # model is consumed by its total-collect and the delta join; with
    # no common-subplan reuse in Spark that is ~3 scans of each corpus.
    # localCheckpoint (not persist — CacheManager canonicalized-plan
    # reuse would alias identical calls) pins each corpus to ONE scan;
    # tgt_model is <= B rows, raw_fc is the compact doc-bucket table.
    raw_fc = doc_feature_counts(raw, n_buckets, text_col, id_col).localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY
    )
    tgt_model = _bucket_model(
        doc_feature_counts(target, n_buckets, text_col, id_col)
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    raw_model = _bucket_model(raw_fc)
    n_t = tgt_model.agg(F.sum("c")).collect()[0][0] or 0
    n_r = raw_model.agg(F.sum("c")).collect()[0][0] or 0
    denom_t, denom_r = float(n_t + n_buckets), float(n_r + n_buckets)
    # <= B rows: the full-outer join and everything after it is tiny.
    delta = (
        tgt_model.withColumnRenamed("c", "ct")
        .join(raw_model.withColumnRenamed("c", "cr"), "bucket", "full_outer")
        .select(
            "bucket",
            F.round(
                (
                    F.log10(
                        (F.coalesce("ct", F.lit(0)) + 1) / F.lit(denom_t)
                    )
                    - F.log10(
                        (F.coalesce("cr", F.lit(0)) + 1) / F.lit(denom_r)
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("d_micro"),
        )
    )
    # buckets unseen by BOTH models (possible when scoring docs outside
    # the model-building corpora) fall back to the pure-smoothing delta
    d0 = int(round((math.log10(1.0 / denom_t) - math.log10(1.0 / denom_r)) * 1e6))
    scored = raw_fc.join(F.broadcast(delta), "bucket", "left")
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_feats"),
        F.sum(F.col("k") * F.coalesce("d_micro", F.lit(d0))).alias("logw_micro"),
    )


_LOG10_E = 0.4342944819032518


def gumbel_micro(id_col: Column, salt: str = "dsir") -> Column:
    """Deterministic Gumbel(0,1) noise in integer millionths, SCALED
    to the log10 domain: the importance weights are log10 ratios, and
    Gumbel-max sampling proportional to w needs the noise on the SAME
    log scale as ln(w) — adding raw -ln(-ln u) to a log10 weight
    samples w^(1/ln 10) ≈ w^0.434, i.e. temperature ~2.3 (review
    r05). g = -ln(-ln(u)) * log10(e), u = (md5_32(id:salt) + 0.5) /
    2^32 — the +0.5 keeps u strictly inside (0,1)."""
    h = _hash32(F.concat_ws(":", id_col.cast("string"), F.lit(salt)))
    u = (h + F.lit(0.5)) / F.lit(_U32)
    return F.round(-F.log(-F.log(u)) * F.lit(_LOG10_E) * 1e6).cast("long")


def dsir_resample(
    weights: DataFrame, k: int, salt: str = "dsir"
) -> DataFrame:
    """Gumbel top-k selection over (doc_id, n_feats, logw_micro):
    adds score_micro = logw_micro + gumbel and keep = rank <= k under
    (score desc, doc_id asc) — WITHOUT a global sort: the k-th pair is
    a TakeOrdered(k) scalar pair, the flag a row-local comparison."""
    # lazy pin: the k-th-threshold collect below executes the whole
    # weights lineage (broadcast join + aggregations); without it the
    # returned frame re-runs the same plan on first use (review r05)
    w = weights.withColumn(
        "score_micro", F.col("logw_micro") + gumbel_micro(F.col("doc_id"), salt)
    ).localCheckpoint(eager=False)
    if k <= 0:  # distinct from the empty-INPUT case below, which keeps all
        return w.withColumn("keep", F.lit(False))
    kth = (
        w.select("score_micro", "doc_id")
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(k)
        .orderBy(F.col("score_micro").asc(), F.desc("doc_id"))
        .limit(1)
        .collect()
    )
    if not kth:  # fewer than 1 row total
        return w.withColumn("keep", F.lit(True))
    thr_s, thr_id = kth[0]["score_micro"], kth[0]["doc_id"]
    keep = (F.col("score_micro") > F.lit(thr_s)) | (
        (F.col("score_micro") == F.lit(thr_s)) & (F.col("doc_id") <= F.lit(thr_id))
    )
    return w.withColumn("keep", keep)
