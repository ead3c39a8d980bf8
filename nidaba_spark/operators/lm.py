"""Distributed n-gram language-model scoring — the CCNet-class
perplexity filter, built the way the original distributed LM paper
prescribes.

``stupid_backoff_score`` implements Stupid Backoff (Brants et al.
2007, "Large Language Models in Machine Translation" — the scheme
designed FOR MapReduce-scale corpora precisely because it needs no
normalized discounting pass):

    S(w2 | w1) = c(w1 w2) / c(w1)          if the bigram was seen
               = alpha * c(w2) / N          else if w2 was seen
               = alpha * 1 / N              else (OOV floor)

with alpha = 0.4 (the paper's value). The per-document score is the
mean log10 S over the document's bigram positions — the
perplexity-proxy used by CCNet/RefinedWeb-style quality filtering,
where a reference-corpus LM scores candidate documents and the tails
are cut. Training corpus and scored corpus are independent inputs
(``lm_docs``): scoring a held-out split is what exercises the backoff
tiers.

Plan shape, and why it survives 10^12 rows:

* model build — two hash aggregations over the TRAINING corpus
  (unigram counts, bigram counts), both map-side-combined so the
  exchanges carry distinct types, not token occurrences; one
  model-side join (bigram types x unigram types on w1) precomputes
  log10(c12/c1) per bigram TYPE so the scoring path never needs the
  denominator join. N rides in as one scalar collect (a single row).
* scoring — per-doc bigram term frequencies first (groupBy doc_id,
  w1, w2: map-side combine collapses within-doc repeats before any
  exchange), then a SINGLE-LINEAGE lookup chain. The lookup keys are
  zipfian — "of the" appears in every English document, textbook join
  skew — and the classic hot/cold row-split (textstats.unigram_logprob)
  is deliberately NOT used here: a LEFT join only row-splits via an
  inner/anti pair, which references the scored corpus twice PER TIER
  (Spark has no common-subplan reuse without materialization), and at
  10^12 rows re-scanning the corpus is strictly worse than shuffling
  compact tf rows. Instead each tier is:

    1. broadcast LEFT join against the ``n_hot`` most frequent model
       rows — resolves the zipf head map-side, zero shuffle, one
       lineage;
    2. shuffle LEFT join against the cold tail, with every
       already-resolved row's join key replaced by a '#'-prefixed
       per-doc salt (tokens are [a-z0-9]+, so '#...' can never match
       a real model key): resolved rows spread uniformly across the
       exchange instead of piling the head keys onto single
       partitions, and they pass through as non-matches. AQE
       skew-split stays on as the second line of defense for the
       tail.

  Net: one scan of the scored corpus, two broadcast + two shuffle
  joins, no skewed exchange.
* bigram extraction is the linear-time projected-array form
  (filters._exploded_grams' discipline): the words array is bound as
  a column BEFORE the position lambda, and the explode (Generate)
  between the split and the lambda stops CollapseProject from
  re-inlining the tokenizer into the per-element loop — the measured
  O(words^2) mega-page trap pinned in tests/test_plan_shapes.py.

Cross-engine exactness: per-position log scores are quantized to
INTEGER millionths (round(log10(..) * 1e6) as long) on both the Spark
and oracle sides, so the per-document aggregation is exact integer
arithmetic — float summation ORDER (which differs between engines and
across partitionings) cannot flip the 6th decimal. The published
avg_logscore is then derived from the two identical integers with the
identical double expression on both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .filters import _words

ALPHA = 0.4
_NSALT = 1024


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, w1, w2): one row per bigram POSITION (duplicates kept;
    docs with < 2 words emit nothing). Linear-time: the words array is
    projected first, the lambda only does two O(1) element_at's."""
    w = docs.select(
        # aliased, not cast: the id may be a long (documents) or a
        # string url (curate's LM floor) — _exploded_grams convention
        F.col(id_col).alias("doc_id"),
        _words(F.col(text_col)).alias("_w"),
    )
    sz = F.size("_w")
    pairs = F.when(
        sz >= 2,
        F.transform(
            F.sequence(F.lit(1), sz - 1),
            lambda i: F.struct(
                F.element_at("_w", i).alias("w1"),
                F.element_at("_w", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return w.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", "bg.w1", "bg.w2"
    )


def _salted_when_resolved(key: Column, resolved: Column) -> Column:
    """The de-skew trick: once a row is resolved by the hot broadcast,
    its cold-join key becomes a uniform per-row salt that (a) can never
    match a model key — real keys are [a-z0-9 ]+, the salt starts '#'
    — and (b) hashes uniformly across the exchange, so the zipf head's
    rows stop piling onto single shuffle partitions. Deterministic
    (hash of the row's own key columns), so retries re-derive it."""
    salt = F.concat(
        F.lit("#"),
        F.pmod(F.xxhash64(F.col("doc_id"), F.col("w1"), F.col("w2")), F.lit(_NSALT)),
    )
    return F.when(resolved, salt).otherwise(key)


def stupid_backoff_score(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    alpha: float = ALPHA,
    n_hot: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``docs`` under a Stupid Backoff bigram LM trained on
    ``lm_docs`` (default: ``docs`` itself — the closed, fully
    oracle-able form). Returns (doc_id, n_bigrams, avg_logscore) for
    every doc with >= 2 words; lower = less like the training corpus.
    """
    from pyspark import StorageLevel

    if lm_docs is None:
        lm_docs = docs
    # The model tables are each consumed 3-5 times downstream (total
    # collect, the model-side join, hot limit + cold anti per tier) and
    # Spark has no common-subplan reuse — unmaterialized, every consumer
    # re-scans the TRAINING corpus. localCheckpoint (not persist: the
    # CacheManager matches canonicalized plans, so a second identical
    # call would silently read the first call's cache) pins each to one
    # scan; measured 7.2s -> 2.3s cold at sf0.1 and decisive at scale,
    # where "train once, score forever" is the production shape anyway.
    uni = (
        lm_docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    total = uni.agg(F.sum("c")).collect()[0][0] or 0
    n = float(total) if total else 1.0
    big = doc_bigrams(lm_docs, text_col, id_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    # one model-side join (bigram types x unigram types); precomputing
    # log_s keeps the denominator join off the scoring path entirely.
    big_lm = big.join(uni.withColumnRenamed("w", "w1"), "w1").select(
        F.concat_ws(" ", "w1", "w2").alias("bkey"),
        F.col("c12").alias("_rank"),
        F.round(F.log10(F.col("c12") / F.col("c")) * 1e6)
        .cast("long")
        .alias("log_s"),
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    uni_bo = uni.select(
        F.col("w").alias("ukey"),
        F.col("c").alias("_urank"),
        F.round(F.log10(F.lit(alpha) * F.col("c") / F.lit(n)) * 1e6)
        .cast("long")
        .alias("log_bo"),
    )
    floor = int(round(math.log10(alpha / n) * 1e6))

    hot_big = big_lm.orderBy(F.desc("_rank"), "bkey").limit(n_hot).drop("_rank")
    cold_big = big_lm.join(
        F.broadcast(hot_big.select("bkey")), "bkey", "left_anti"
    ).drop("_rank")
    hot_uni = uni_bo.orderBy(F.desc("_urank"), "ukey").limit(n_hot).drop("_urank")
    cold_uni = uni_bo.join(
        F.broadcast(hot_uni.select("ukey")), "ukey", "left_anti"
    ).drop("_urank")

    tf = (
        doc_bigrams(docs, text_col, id_col)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .withColumn("bkey", F.concat_ws(" ", "w1", "w2"))
    )
    # tier 1: bigram head map-side, bigram tail via salted shuffle join
    t1 = tf.join(
        F.broadcast(hot_big.withColumnRenamed("log_s", "s_hot")), "bkey", "left"
    )
    t1 = t1.withColumn(
        "bkey", _salted_when_resolved(F.col("bkey"), F.col("s_hot").isNotNull())
    ).join(cold_big.withColumnRenamed("log_s", "s_cold"), "bkey", "left")
    t1 = t1.withColumn("log_s", F.coalesce("s_hot", "s_cold"))
    # tier 2: unigram backoff for rows no bigram tier resolved
    t2 = t1.withColumn("ukey", F.col("w2")).join(
        F.broadcast(hot_uni.withColumnRenamed("log_bo", "bo_hot")), "ukey", "left"
    )
    t2 = t2.withColumn(
        "ukey",
        _salted_when_resolved(
            F.col("ukey"),
            F.col("log_s").isNotNull() | F.col("bo_hot").isNotNull(),
        ),
    ).join(cold_uni.withColumnRenamed("log_bo", "bo_cold"), "ukey", "left")
    scored = t2.select(
        "doc_id",
        "k",
        F.coalesce("log_s", "bo_hot", "bo_cold", F.lit(floor)).alias("s_micro"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("s_micro")).alias("_sum_micro"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.round(
            (F.col("_sum_micro") / F.lit(1000000.0)) / F.col("n_bigrams"), 6
        ).alias("avg_logscore"),
    )
