"""Corpus snapshot diff: what changed between two crawls/curation runs.

Training-data-pipeline component: incremental recrawl pipelines need
to know, per url, whether a page is NEW, GONE, CHANGED, or UNCHANGED
relative to the previous snapshot — added pages flow into extraction,
changed pages invalidate downstream dedup/index entries (the
streaming change detector in streaming/changes.py is the per-batch
sibling; this is the batch two-snapshot form), unchanged pages are
skipped entirely.

Scale shape: both snapshots are projected to a slim (key, xxhash64)
pair BEFORE the join — page text/bytes never enter the shuffle — and
the diff is ONE full-outer hash join keyed on url. Snapshots written
with sources/bucketed.py on the key column join with ZERO Exchanges
(the co-bucketed SMJ path); otherwise the two skinny projections
shuffle once. Equality is by 64-bit content hash: a collision marks
a changed page 'unchanged' with probability ~2^-64 per url — the
standard recrawl trade (curate.py's recrawl dedup makes the same
one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(key, status) for every url present in either snapshot:
    'added' (new only), 'removed' (old only), 'changed' (both, text
    hash differs), 'unchanged' (both, text hash equal).

    Each side must be url-unique (curate's recrawl dedup guarantees
    that upstream); duplicate keys would fan the full-outer join out.
    """
    o = old.select(
        F.col(key_col).alias(key_col),
        F.xxhash64(F.col(text_col)).alias("_oh"),
    )
    n = new.select(
        F.col(key_col).alias(key_col),
        F.xxhash64(F.col(text_col)).alias("_nh"),
    )
    j = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") == F.col("_nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(key_col, status.alias("status"))


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Four-row (status, n) rollup of ``corpus_diff`` — the snapshot
    health report an incremental pipeline logs per crawl. Same single
    join, then a map-side-combined count."""
    return (
        corpus_diff(old, new, key_col=key_col, text_col=text_col)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


def changed_keys(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Keys needing reprocessing (added + changed) — the work-list an
    incremental extraction run semi-joins against, so unchanged pages
    never re-enter the pipeline."""
    d = corpus_diff(old, new, key_col=key_col, text_col=text_col)
    return d.filter(F.col("status").isin("added", "changed")).select(key_col)
