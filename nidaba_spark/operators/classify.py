"""S3 — classify: content-vs-boilerplate decision, 100% JVM-side.

Web-text analog of nidaba's recognition phase (``ocr.tesseract`` —
reference: nidaba/tasks/ocr.py; SURVEY.md §2A A11) plus the crawler
`text` fallback standing in for alternative recognizers
(``kraken.ocr``/``ocropus.ocr`` — nidaba/plugins/{kraken,ocropus}.py;
SURVEY.md §2A A12, collapsed to a coalesce per the variant-lattice
note).

Spark shape: pure Column expressions over the ``blocks`` array using
higher-order functions (``transform``/``filter`` with the index
lambda for prev/next-neighbor features) — whole-stage-codegen'd, no
Python, no shuffle, no explode/regroup. The decision tree is the
boilerpipe NumWordsRulesClassifier re-expressed as ``when`` chains;
it must stay semantically identical to
functions/classify_rules.classify_block (the pure-Python spec the
golden oracle runs) — the golden e2e test enforces the equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import classify_rules as R

_FINAL = ["url", "warc_ts", "lang", "doctype", "n_bytes", "n_blocks", "kept", "_pid"]


def _is_content(blocks: Column, x: Column, i: Column) -> Column:
    """NumWordsRules decision for element x at 0-based index i."""
    n = F.size(blocks)
    prev_words = F.when(i >= 1, F.element_at(blocks, i)["n_words"]).otherwise(F.lit(0))
    prev_ld = F.when(i >= 1, F.element_at(blocks, i)["link_density"]).otherwise(F.lit(0.0))
    next_words = F.when(i + 2 <= n, F.element_at(blocks, i + 2)["n_words"]).otherwise(F.lit(0))
    curr_words = x["n_words"]
    low_link = x["link_density"] <= F.lit(R.MAX_LINK_DENSITY_CURR)
    prev_low = prev_ld <= F.lit(R.MAX_LINK_DENSITY_PREV)
    rule_low = (
        (curr_words > F.lit(R.MIN_WORDS_CURR))
        | (next_words > F.lit(R.MIN_WORDS_NEXT))
        | (prev_words > F.lit(R.MIN_WORDS_PREV))
    )
    rule_high = (curr_words > F.lit(R.MIN_WORDS_CURR_HIGHLINK)) | (
        next_words > F.lit(R.MIN_WORDS_NEXT_HIGHLINK)
    )
    return low_link & F.when(prev_low, rule_low).otherwise(rule_high)


def _score(x: Column) -> Column:
    w = F.least(x["n_words"], F.lit(100)).cast("double") / F.lit(100.0)
    return F.round(w * (F.lit(1.0) - F.least(F.lit(1.0), x["link_density"])), 6)


def _kept_struct(x: Column, kind: Column, score: Column) -> Column:
    return F.struct(
        x["block_id"].alias("block_id"),
        x["text"].alias("text"),
        kind.alias("kind"),
        score.alias("score"),
    )


def classify_stage(segmented: DataFrame) -> DataFrame:
    """SEGMENTED → CLASSIFIED (kept blocks array, with fallback routing)."""
    blocks = F.col("blocks")

    html_candidates = F.transform(
        blocks,
        lambda x, i: F.struct(
            x["block_id"].alias("block_id"),
            x["text"].alias("text"),
            F.lit("content").alias("kind"),
            _score(x).alias("score"),
            _is_content(blocks, x, i).alias("is_content"),
        ),
    )
    html_kept = F.transform(
        F.filter(html_candidates, lambda s: s["is_content"]),
        lambda s: F.struct(
            s["block_id"].alias("block_id"),
            s["text"].alias("text"),
            s["kind"].alias("kind"),
            s["score"].alias("score"),
        ),
    )
    pdf_kept = F.transform(
        blocks, lambda x: _kept_struct(x, F.lit("pdf_line"), F.lit(1.0))
    )
    kept = F.when(F.col("doctype") == "pdf", pdf_kept).otherwise(html_kept)

    fallback = F.when(
        F.col("fallback_text").isNotNull() & (F.col("fallback_text") != ""),
        F.array(
            F.struct(
                F.lit(0).cast("int").alias("block_id"),
                F.col("fallback_text").alias("text"),
                F.lit("fallback").alias("kind"),
                F.lit(1.0).alias("score"),
            )
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<block_id:int,text:string,kind:string,score:double>>)"))

    return (
        segmented.withColumn("kept_raw", kept)
        .withColumn(
            "kept", F.when(F.size("kept_raw") > 0, F.col("kept_raw")).otherwise(fallback)
        )
        .withColumn("n_blocks", F.size(blocks))
        .select(*_FINAL)
    )
