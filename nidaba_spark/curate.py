"""End-to-end training-data curation: pages → packed examples.

The composition the individual operators exist for, as one documented
plan:

    extract (fused parse)            pipeline.extract
      → quality filter               textstats.quality_score
      → exact dedup (keep-min)       dedup.exact_dedup semantics
      → weighted source mixing       mixing.weighted_sample
      → sequence packing             packing.pack_assignments

Every stage is a lazy DataFrame transform — the whole flow is ONE
Catalyst plan (the extract's single salted shuffle + packing's range
shuffle; filter/dedup/mixing add a groupBy-dedup semi-join and pure
scan predicates). Each stage's operator carries its own oracle/gate;
this module pins the composition itself: monotone row counts,
determinism, and the packing invariant over the surviving set
(tests/test_curate.py).

At 10^12 rows the same composition runs staged (Pipeline.run per
phase with checkpoints/lineage between), but the OPERATORS are
identical — this single-plan form is also what the incremental path
(run_incremental) executes per crawl drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import pipeline
from .functions.textnorm import normalize_words  # noqa: F401  (spec ref)
from .operators import mixing, packing
from .operators.textstats import quality_score, token_count_ws


def curate(
    pages: DataFrame,
    min_quality: float = 0.5,
    source_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    pack_budget: int = 1024,
    nsalt: int = 256,
    npartitions: int | None = None,
) -> DataFrame:
    """pages (url, warc_ts, html, text, lang) → packed curated docs:
    (url, n_tokens, tokens_before, pack_id, pack_pos, quality, text).

    Dedup here is BY EXTRACTED TEXT, keep-min-url (the exact_dedup
    rule on the derived corpus): a window-free groupBy + semi-join,
    so the plan stays shuffle-bounded by the dedup key."""
    ext = pipeline.extract(pages, nsalt=nsalt, npartitions=npartitions)
    # recrawl dedup first — keep the LATEST crawl per url, so url is
    # unique downstream and the text-dedup semi-join key is sound
    latest = ext.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    ext1 = ext.join(latest, ["url", "warc_ts"], "left_semi")
    docs = ext1.filter(F.col("text") != "").select(
        "url", "text", F.col("lang").alias("source")
    )
    scored = docs.withColumn("quality", quality_score(F.col("text")))
    good = scored.filter(F.col("quality") >= F.lit(min_quality))
    # exact dedup on extracted text: keep the lexicographically first
    # url per text (deterministic); semi-join back to keep columns
    keep = good.groupBy(F.xxhash64("text").alias("_h")).agg(
        F.min("url").alias("url")
    )
    deduped = good.join(keep, "url", "left_semi")
    mixed = (
        mixing.weighted_sample(
            deduped, source_rates, key_col="source", id_col="url",
            default=default_rate,
        )
        if source_rates is not None
        else deduped
    )
    packs = packing.pack_assignments(
        mixed, token_count_ws(F.col("text")), pack_budget, order_col="url",
        npartitions=npartitions,
    )
    return packs.join(
        mixed.select("url", "quality", "text"), "url"
    ).select(
        "url", "n_tokens", "tokens_before", "pack_id", "pack_pos",
        "quality", "text",
    )
