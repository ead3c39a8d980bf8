"""Model-based document quality classifier.

The learned complement to ``textstats.quality_score``'s hand-set
Gopher-style rules: the CCNet / GPT-3-style quality filter is a linear
classifier over cheap surface features, trained to separate a target
corpus from raw crawl text (Wenzek et al. 2020, CCNet; Brown et al.
2020 §A). Re-expressed Spark-first, the operator splits into two
halves with very different execution profiles:

* **Training** (``train_quality_classifier``) — distributed
  ``pyspark.ml`` LogisticRegression: each L-BFGS iteration is one
  map-side gradient partial per partition tree-aggregated to a
  d-dimensional vector on the driver (d = 5 here), so a 10^12-row
  corpus trains without any executor holding more than its partition
  and the driver holding more than the coefficient vector. Run rarely,
  offline.
* **Inference** (``score``) — the trained coefficients baked into a
  pure Column expression: ``sigmoid(w·x + b)`` over codegen'd surface
  features. Zero Python, zero MLlib, zero model object at scoring
  time — the hot path at 100 TB is whole-stage-codegen arithmetic and
  the expression is DuckDB-mirrorable, so the operator stays under the
  exact-oracle regime despite being "a model".

Features are the five ``textstats.quality_features`` surface stats
with the two counts log-compressed (log1p keeps 0 finite; raw char
counts at web scale span 6 orders of magnitude and would swamp the
ratios). Every feature is rounded before the dot product so the Spark
and DuckDB evaluations agree bit-for-bit after the oracle's 6-dp
canonicalization.

Labels come from the no-labeled-data bootstrap the public quality
filters use (CCNet trains target-domain vs crawl; with no external
corpus in the sandbox the stand-in is clean vs synthetically degraded
text): positives are the corpus documents, negatives are the SAME
documents deterministically corrupted by ``synthetic_negatives`` —
vowels replaced by punctuation (even ids) or whitespace stripped
(odd ids), i.e. exactly the degradations the Gopher-style surface
features are supposed to catch. Swap the label column for real
target-vs-crawl labels on a cluster; the plumbing is identical.

``DEFAULT_MODEL`` pins coefficients trained by
``scripts/train_quality_model.py`` on the sf0.001 documents corpus;
tests/test_quality_model.py gates separation quality and train
determinism; tests/test_offdriver_oracles.py checks the scoring
expression against DuckDB row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import quality_bound_cols, quality_feature_cols

#: Feature order is part of the model contract (coefficients zip it).
FEATURE_COLS = ("log_chars", "log_words", "stop_ratio", "punct_ratio", "mean_word_len")

#: Trained by scripts/train_quality_model.py (seeded synthetic sf0.001
#: documents, clean-vs-degraded labels, maxIter=50, regParam=0.01;
#: training accuracy 1.0) and pinned; regenerate with that script when
#: the feature set or corpus changes. Signs read sanely: stopword mass
#: up-weights, punctuation noise down-weights.
DEFAULT_MODEL: dict = {
    "coefficients": {
        "log_chars": -0.128076,
        "log_words": 0.814256,
        "stop_ratio": 34.823326,
        "punct_ratio": -18.803668,
        "mean_word_len": -0.010725,
    },
    "intercept": -0.910593,
}


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the FEATURE_COLS surface features (all codegen exprs).

    The log features are rounded to 6 dp and the base ratios arrive
    4-dp-rounded from quality_features, so the DuckDB oracle mirror
    reproduces the exact doubles entering the dot product.

    Input columns that share a feature name (the documents table
    carries its own ``n_chars``) are REPLACED by the recomputed
    feature — the model must score the text it sees, not a stale
    upstream stat.
    """
    # strip the DERIVED outputs too: re-featurizing a previously
    # featurized table otherwise emits duplicate log_chars/log_words
    # columns and score_expr fails with AMBIGUOUS_REFERENCE (review
    # r05) — the documented REPLACED contract covers every feature
    base_names = {
        "n_chars", "n_words", "stop_ratio", "punct_ratio",
        "mean_word_len", "log_chars", "log_words",
    }
    keep = [c for c in df.columns if c not in base_names]
    feats = df.select(
        *keep, *quality_bound_cols(F.col(text_col))
    ).select(*keep, *quality_feature_cols())
    return feats.select(
        "*",
        F.round(F.log1p(F.col("n_chars")), 6).alias("log_chars"),
        F.round(F.log1p(F.col("n_words")), 6).alias("log_words"),
    )


def score_expr(model: dict | None = None) -> Column:
    """sigmoid(w·x + b) over the FEATURE_COLS columns, rounded to 4 dp.

    Pure arithmetic Column — whole-stage codegen, no UDF, no model
    object shipped to executors.
    """
    m = model or DEFAULT_MODEL
    z: Column = F.lit(float(m["intercept"]))
    for name in FEATURE_COLS:
        z = z + F.lit(float(m["coefficients"][name])) * F.col(name).cast("double")
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)


def score(df: DataFrame, model: dict | None = None) -> DataFrame:
    """Append ``model_score`` to a featurized DataFrame."""
    return df.withColumn("model_score", score_expr(model))


def synthetic_negatives(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic degraded copies of the corpus — the negative class
    for label-free quality-classifier training.

    Two corruption modes, split by id parity so both degradation
    families appear in training (pure codegen exprs, no randomness):

      even ids — vowels → ':' (spikes punct_ratio, zeroes stop_ratio);
      odd ids  — whitespace stripped (one mega-token: n_words → 1,
                 mean_word_len explodes).
    """
    t = F.col(text_col)
    # parity must survive NON-numeric ids: cast('long') of a string id
    # is NULL, pmod(NULL,2)==0 is NULL, and every row silently took
    # the whitespace branch — the punct-spike family never appeared in
    # training (review r05). Numeric ids keep the original cast path
    # (training pins stay stable); others fall back to a hash parity.
    parity_key = F.coalesce(
        F.col(id_col).cast("long"),
        F.xxhash64(F.col(id_col).cast("string")),
    )
    corrupted = F.when(
        F.pmod(parity_key, F.lit(2)) == 0,
        F.regexp_replace(t, r"[aeiouAEIOU]", ":"),
    ).otherwise(F.regexp_replace(t, r"\s+", ""))
    return docs.withColumn(text_col, corrupted)


def training_frame(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Featurized union of clean (label 1.0) and degraded (label 0.0)
    copies — the input ``train_quality_classifier`` expects."""
    pos = docs.select(id_col, text_col).withColumn("label", F.lit(1.0))
    neg = (
        synthetic_negatives(docs, text_col, id_col)
        .select(id_col, text_col)
        .withColumn("label", F.lit(0.0))
    )
    return featurize(pos.unionByName(neg), text_col)


def train_quality_classifier(
    featurized: DataFrame,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> dict:
    """Distributed LR fit → plain coefficient dict (the model artifact).

    Coefficients round to 6 dp: L-BFGS tree-aggregation order puts the
    run-to-run float noise in the last ulps (same rationale as the IVF
    centroid rounding, operators/ivf.py), so the rounded dict is
    deterministic for a fixed corpus + partitioning.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="_features")
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    fitted = lr.fit(asm.transform(featurized.select(*FEATURE_COLS, label_col)))
    return {
        "coefficients": {
            name: round(float(w), 6)
            for name, w in zip(FEATURE_COLS, fitted.coefficients)
        },
        "intercept": round(float(fitted.intercept), 6),
    }


def oracle_score_sql(model: dict | None = None) -> str:
    """The DuckDB mirror of score_expr over the doc_quality feature CTE
    column names — kept beside the Spark expression so the two cannot
    drift independently."""
    m = model or DEFAULT_MODEL
    terms = " + ".join(
        f"({m['coefficients'][name]!r} * {name})" for name in FEATURE_COLS
    )
    return f"round(1.0 / (1.0 + exp(-({m['intercept']!r} + {terms}))), 4)"
