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


def doc_ngrams(
    docs: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, w1..wn): one row per n-gram POSITION (duplicates kept;
    docs with < n words emit nothing). Linear-time: the words array is
    projected first, the lambda only does n O(1) element_at's."""
    w = docs.select(
        # aliased, not cast: the id may be a long (documents) or a
        # string url (curate's LM floor) — _exploded_grams convention
        F.col(id_col).alias("doc_id"),
        _words(F.col(text_col)).alias("_w"),
    )
    sz = F.size("_w")
    struct_t = ",".join(f"w{j}:string" for j in range(1, n + 1))
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.struct(
                *[
                    F.element_at("_w", i + j).alias(f"w{j + 1}")
                    for j in range(n)
                ]
            ),
        ),
    ).otherwise(F.array().cast(f"array<struct<{struct_t}>>"))
    return w.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", *[f"g.w{j}" for j in range(1, n + 1)]
    )


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, w1, w2) — doc_ngrams(n=2), kept as the named form the
    DSIR feature builder and tests import."""
    return doc_ngrams(docs, 2, text_col, id_col)


def _salted_when_resolved(key: Column, resolved: Column, wcols: list[str]) -> Column:
    """The de-skew trick: once a row is resolved by the hot broadcast,
    its cold-join key becomes a uniform per-row salt that (a) can never
    match a model key — real keys are [a-z0-9 ]+, the salt starts '#'
    — and (b) hashes uniformly across the exchange, so the zipf head's
    rows stop piling onto single shuffle partitions. Deterministic
    (hash of the row's own key columns), so retries re-derive it."""
    salt = F.concat(
        F.lit("#"),
        F.pmod(
            F.xxhash64(F.col("doc_id"), *[F.col(c) for c in wcols]),
            F.lit(_NSALT),
        ),
    )
    return F.when(resolved, salt).otherwise(key)


_COUNT_NAME = {2: "n_bigrams", 3: "n_trigrams"}


def _gram_counts(
    lm_docs: DataFrame, g: int, text_col: str, id_col: str
) -> DataFrame:
    """(key, c): corpus-wide counts of space-joined g-grams — one
    map-side-combined aggregation keyed by distinct gram TYPES."""
    if g == 1:
        keyed = lm_docs.select(F.explode(_words(F.col(text_col))).alias("key"))
    else:
        keyed = doc_ngrams(lm_docs, g, text_col, id_col).select(
            F.concat_ws(" ", *[f"w{j}" for j in range(1, g + 1)]).alias("key")
        )
    return keyed.groupBy("key").agg(F.count(F.lit(1)).alias("c"))


def stupid_backoff_score(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    alpha: float = ALPHA,
    n_hot: int = 1024,
    order: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``docs`` under a Stupid Backoff ``order``-gram LM trained
    on ``lm_docs`` (default: ``docs`` itself — the closed, fully
    oracle-able form). Returns (doc_id, n_<order>grams, avg_logscore)
    for every doc with >= order words; lower = less like the training
    corpus. Tiers, per Brants et al.:

        S_g(w_i | w_{i-g+1..i-1}) = alpha^(order-g)
                                    * c(last g words) / c(first g-1 of them)
        (g = order first; each unseen tier backs off to g-1; the g=1
        denominator is N; total OOV floor = alpha^(order-1) / N)

    Each tier is one broadcast hot-head join + one salted cold shuffle
    join over the SAME single lineage (module docstring)."""
    from pyspark import StorageLevel

    if order < 2:
        raise ValueError("order must be >= 2")
    if lm_docs is None:
        lm_docs = docs
    # Every counts table is consumed 2-3x (its own model tier + the
    # next tier's denominator + the N collect) and Spark has no
    # common-subplan reuse — unmaterialized, every consumer re-scans
    # the TRAINING corpus. localCheckpoint (not persist: CacheManager
    # matches canonicalized plans, so a second identical call would
    # silently read the first call's cache) pins each to one scan;
    # measured 7.2s -> 2.3s cold at sf0.1 and decisive at scale, where
    # "train once, score forever" is the production shape anyway.
    counts: dict[int, DataFrame] = {}
    for g in range(1, order + 1):
        cdf = _gram_counts(lm_docs, g, text_col, id_col)
        if g < order:  # top-order counts have exactly one consumer
            cdf = cdf.localCheckpoint(
                eager=False, storageLevel=StorageLevel.DISK_ONLY
            )
        counts[g] = cdf
    total = counts[1].agg(F.sum("c")).collect()[0][0] or 0
    n = float(total) if total else 1.0

    models: dict[int, DataFrame] = {}
    for g in range(1, order + 1):
        factor = alpha ** (order - g)
        if g == 1:
            models[1] = counts[1].select(
                "key",
                F.col("c").alias("_rank"),
                F.round(F.log10(F.lit(factor) * F.col("c") / F.lit(n)) * 1e6)
                .cast("long")
                .alias("val"),
            )
        else:
            # denominator = the gram's (g-1)-word PREFIX count; the
            # model-side join is bounded by distinct gram types and
            # keeps the denominator off the scoring path entirely
            den = counts[g - 1].select(
                F.col("key").alias("_pfx"), F.col("c").alias("_cd")
            )
            num = counts[g].withColumn(
                "_pfx", F.substring_index("key", " ", g - 1)
            )
            mdl = num.join(den, "_pfx").select(
                "key",
                F.col("c").alias("_rank"),
                F.round(
                    F.log10(F.lit(factor) * F.col("c") / F.col("_cd")) * 1e6
                )
                .cast("long")
                .alias("val"),
            )
            models[g] = mdl.localCheckpoint(
                eager=False, storageLevel=StorageLevel.DISK_ONLY
            )
    floor = int(round(math.log10(alpha ** (order - 1) / n) * 1e6))

    wcols = [f"w{j}" for j in range(1, order + 1)]
    tf = (
        doc_ngrams(docs, order, text_col, id_col)
        .groupBy("doc_id", *wcols)
        .agg(F.count(F.lit(1)).alias("k"))
    )
    df = tf
    parts: list[str] = []  # value columns in backoff precedence order
    for g in range(order, 0, -1):
        key = F.concat_ws(" ", *wcols[order - g :])
        hot = models[g].orderBy(F.desc("_rank"), "key").limit(n_hot).drop("_rank")
        cold = models[g].join(
            F.broadcast(hot.select("key")), "key", "left_anti"
        ).drop("_rank")
        resolved = (
            F.coalesce(*[F.col(p) for p in parts]).isNotNull()
            if parts
            else F.lit(False)
        )
        df = df.withColumn(
            "_k", _salted_when_resolved(key, resolved, wcols)
        ).join(
            F.broadcast(hot.select(F.col("key").alias("_k"), F.col("val").alias(f"_h{g}"))),
            "_k",
            "left",
        ).drop("_k")
        parts.append(f"_h{g}")
        resolved = F.coalesce(*[F.col(p) for p in parts]).isNotNull()
        df = df.withColumn(
            "_k", _salted_when_resolved(key, resolved, wcols)
        ).join(
            cold.select(F.col("key").alias("_k"), F.col("val").alias(f"_c{g}")),
            "_k",
            "left",
        ).drop("_k")
        parts.append(f"_c{g}")
    scored = df.select(
        "doc_id",
        "k",
        F.coalesce(*parts, F.lit(floor)).alias("s_micro"),
    )
    n_name = _COUNT_NAME.get(order, f"n_{order}grams")
    agg = scored.groupBy("doc_id").agg(
        F.sum("k").alias(n_name),
        F.sum(F.col("k") * F.col("s_micro")).alias("_sum_micro"),
    )
    return agg.select(
        "doc_id",
        n_name,
        F.round(
            (F.col("_sum_micro") / F.lit(1000000.0)) / F.col(n_name), 6
        ).alias("avg_logscore"),
    )
