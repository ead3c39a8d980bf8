"""Mergeable sketches over the corpus: DataSketches HLL for distinct
counts, Spark CountMinSketch for heavy-hitter frequencies.

THE 100 TB pattern these enable: pre-aggregate each ingest unit (day,
crawl, partition) into a tiny sketch ROW once, then answer
corpus-wide questions by unioning sketches — never re-scanning raw
data. A year of daily distinct-token counts becomes a 365-row table;
the global number is one ``hll_union_agg`` over it. Both sketch
families are associative/commutative, so the same rows also merge
across clusters and survive backfills.

Everything JVM-side: ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` and ``count_min_sketch`` are codegen
aggregate expressions (Spark 3.5+ public API); no Python touches the
hot path. The CMS query helper deserializes the (small) sketch via
the JVM class on the driver — reading a sketch is a driver-side
operation by design.

Error contracts (published, tested in tests/test_sketches.py):
  * HLL (lgConfigK=12): relative standard error ~1.6%; tests gate at
    5% vs exact and pin union(parts) == direct(whole) estimates.
  * CMS (eps, confidence): NEVER undercounts; overcount ≤ eps·N with
    probability ≥ confidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# canonical word definition shared across operators (filters._words)
from .filters import _words as _words_col


def _words_exploded(docs: DataFrame, text_col: str, extra: list[str] | None = None) -> DataFrame:
    """Exploded (…extra cols, word) token stream. ``extra`` carries
    grouping columns; token_cms passes none, so inputs without a
    ``lang`` column work (review-pass finding: the helper used to
    hard-select lang and broke lang-less corpora)."""
    return docs.select(
        *[F.col(c) for c in (extra or [])],
        F.explode(_words_col(F.col(text_col))).alias("word"),
    )


def token_hll_sketches(
    docs: DataFrame, text_col: str = "text", lgk: int = 12
) -> DataFrame:
    """(lang, n_tokens, distinct_tokens_est, sketch) — one HLL sketch
    row per language over the exploded token stream.

    The sketch column is the mergeable artifact: persist these rows
    per ingest unit and never rescan. Partial aggregation applies —
    the shuffle carries one sketch per (map partition, lang), not
    tokens.
    """
    return (
        _words_exploded(docs, text_col, extra=["lang"])
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.hll_sketch_agg("word", F.lit(lgk)).alias("sketch"),
        )
        .select(
            "lang",
            "n_tokens",
            F.hll_sketch_estimate("sketch").alias("distinct_tokens_est"),
            "sketch",
        )
    )


def union_hll(sketches: DataFrame, sketch_col: str = "sketch") -> int:
    """Global distinct estimate from a table of sketch rows — the
    re-scan-free rollup (one tiny job over ≤rows-of-sketches)."""
    row = sketches.select(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("est")
    ).collect()[0]
    return int(row["est"]) if row["est"] is not None else 0


def token_cms(
    docs: DataFrame,
    text_col: str = "text",
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Serialized CountMinSketch over the corpus token stream.

    One codegen aggregate; the result is a few hundred KB regardless
    of corpus size (width = ceil(2/eps), depth =
    ceil(log2(1/(1-conf))) — verified against Spark's
    CountMinSketchImpl; the natural-log form found in some texts
    under-estimates the default-confidence depth 5-vs-7, review r05).
    """
    row = (
        _words_exploded(docs, text_col)
        .select(
            F.count_min_sketch(
                "word", F.lit(eps), F.lit(confidence), F.lit(seed)
            ).alias("cms")
        )
        .collect()[0]
    )
    return bytes(row["cms"])


def cms_estimate(spark: SparkSession, sketch: bytes, item: str) -> int:
    """Query a serialized CMS for an item's frequency estimate
    (driver-side JVM deserialization — sketches are small by design).

    Guarantee: estimate >= true count always; <= true + eps·N with
    probability >= confidence.
    """
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return int(cms.estimateCount(item))


def cms_merge(spark: SparkSession, sketches: list[bytes]) -> bytes:
    """Merge serialized CMS rows (same eps/confidence/seed) into one —
    the per-day-sketch-table rollup, driver-side over tiny payloads."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    jvm = spark.sparkContext._jvm
    acc = None
    for s in sketches:
        bis = jvm.java.io.ByteArrayInputStream(bytearray(s))
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
        if acc is None:
            acc = cms
        else:
            acc.mergeInPlace(cms)
    bos = jvm.java.io.ByteArrayOutputStream()
    acc.writeTo(bos)
    return bytes(bos.toByteArray())
