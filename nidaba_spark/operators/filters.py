"""Corpus-hygiene filters for training-data curation: intra-document
repetition statistics (Gopher/MassiveText-style rules), eval-set
decontamination (word-n-gram overlap), and PII redaction.

All three are pure declarative plans — no Python UDFs anywhere:

* ``repetition_stats``: explode word-bigrams → two hash aggregations
  keyed on (doc_id, bigram) then doc_id. One shuffle on doc_id-salted
  keys (the bigram string rides along only through the first partial
  agg — map-side combine collapses repeats before the exchange), so
  the plan is bounded by distinct (doc, bigram) pairs, not corpus
  tokens. Published rule shape: Rae et al. 2021 (Gopher §A1.1)
  "fraction of characters in the most common n-gram" / "duplicate
  line fraction" — re-expressed at word-bigram granularity because
  the synthetic corpus has no line structure.
* ``decontaminate``: the n-gram-overlap decontamination check used by
  GPT-3/Gopher appendix-style eval hygiene: any training doc sharing
  a word-n-gram with the eval set is flagged. Eval side is distinct
  n-grams (small by construction) → broadcast hash join against the
  exploded training n-grams, count distinct overlaps per doc. At
  10^12 rows: hash grams to 64 bits (xxhash64) and swap the broadcast
  for a bloom-filter pushdown or a shuffle join on the hash — the
  string-keyed broadcast here keeps the operator oracle-checkable
  (DuckDB has no xxhash64).
* ``redact_pii``: email / E.164-ish phone / IPv4 regexp_replace, all
  whole-stage-codegen JVM expressions (count via regexp_extract_all,
  replace via regexp_replace). Patterns restricted to the
  Java-regex ∩ RE2 common subset (no lookaround) so the DuckDB oracle
  runs the byte-identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_SPLIT = "[^a-z0-9]+"

# PII patterns — Java regex ∩ RE2 (no lookaround, ASCII \b only).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,2} \d{3}-\d{3}-\d{4}"
PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), _WORD_SPLIT), lambda t: t != F.lit(""))


def _ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when len(words) < n).

    ``words`` MUST be a bound attribute (a projected column), never the
    inline ``_words(...)`` expression tree: higher-order functions are
    CodegenFallback, and interpreted ``ArrayTransform.eval`` re-evaluates
    the whole lambda subtree per element — an inlined split() makes this
    O(words²) per document (measured: one mega-page pinned a core for
    5+ minutes). Use ``_exploded_grams`` which projects first.
    """
    sz = F.size(words)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _exploded_grams(
    docs: DataFrame, id_col: str, text_col: str, n: int, out: str
) -> DataFrame:
    """(id_col → doc_id, exploded word-n-gram → ``out``), linear-time.

    Two selects: the words array is materialized as a column in the
    first, so the n-gram lambda slices a bound array attribute (O(n)
    per gram) instead of re-splitting the document per gram. The
    multiple references to ``_w`` also stop CollapseProject from
    re-inlining the split into the lambda.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    ).select(
        "doc_id", F.explode(_ngrams(F.col("_w"), n)).alias(out)
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-bigram repetition statistics.

    Returns (doc_id, n_bigrams, top_bigram_frac, dup_bigram_frac) for
    every doc with >= 2 words. top_bigram_frac is the Gopher "most
    common n-gram" mass; dup_bigram_frac = 1 - distinct/total is the
    "duplicate n-gram" mass. A doc is repetition-spam when either is
    high (thresholding is the caller's policy — see q_repetition_filter
    for the published 0.18 cut).

    Scale note: both shuffles carry doc_id in the key, so skew is
    bounded by the largest single document. At 10^12 rows swap the
    bigram string for ``F.xxhash64(bigram)`` in the first groupBy key
    to cut shuffle bytes ~10x (64-bit collisions merge counts with
    probability ~n²/2^65 per doc — immaterial for a filter); the
    string key is kept here because the DuckDB oracle has no xxhash64.
    """
    grams = _exploded_grams(docs, id_col, text_col, 2, "bigram")
    per_gram = grams.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("c"), 4).alias("dup_bigram_frac"),
    )


def duplicate_span_stats(
    docs: DataFrame, n: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Substring-level duplication signal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"),
    approximated by rolling n-token span hashes instead of a suffix
    array: per document, the fraction of its n-token spans that occur
    MORE THAN ONCE corpus-wide (cross-doc boilerplate AND intra-doc
    repeats both count). Docs above a dup_span_frac cut are the
    substring-dedup removal candidates; the paper's 50-token window is
    the default.

    Returns (doc_id, n_spans, dup_span_frac) for docs with >= n words.

    Plan: linear-time exploded spans (projected words array — see
    _ngrams' O(words²) trap) → corpus-wide span counts via one
    map-side-combined hash agg → join counts back on the span →
    per-doc aggregate. Two span-keyed shuffles + one doc-keyed; AQE
    skew-join covers hyper-duplicated spans. The same xxhash64 key
    swap documented on repetition_stats applies at 10^12 scale; the
    string key keeps the DuckDB oracle exact.
    """
    spans = _exploded_grams(docs, id_col, text_col, n, "span")
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("_cnt"))
    return (
        spans.join(counts, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.round(F.avg((F.col("_cnt") > 1).cast("double")), 4).alias(
                "dup_span_frac"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs sharing any word-``n``-gram with the eval set.

    Returns (doc_id, n_overlap) for contaminated docs only, where
    n_overlap counts the DISTINCT training-doc n-grams present in the
    eval set's distinct n-gram universe.
    """
    train_g = _exploded_grams(train, id_col, text_col, n, "gram").distinct()
    eval_g = (
        _exploded_grams(
            eval_df, eval_df.columns[0], text_col, n, "gram"
        ).select("gram").distinct()
    )
    return (
        train_g.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )


def redact_pii(text: Column) -> Column:
    """Redact emails, then IPv4s, then phone numbers (codegen exprs).

    Order matters and is pinned: email first so its digit-bearing
    local parts can't be half-eaten by the IP/phone passes.
    """
    redacted = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4, "<IP>")
    return F.regexp_replace(redacted, PII_PHONE, "<PHONE>")


def pii_counts(text: Column) -> list[Column]:
    """Match counts per PII class (pre-redaction), as columns."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).alias("n_phone"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).alias("n_ip"),
    ]
