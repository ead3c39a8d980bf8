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

from pyspark.sql import DataFrame, Window
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


def recrawl_priority(
    history: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Per-url change statistics over a MULTI-snapshot crawl history —
    the recrawl-scheduling signal (Cho & Garcia-Molina 2003: pages
    should be revisited in proportion to their estimated change rate;
    corpus_diff answers "what changed between TWO snapshots", this
    answers "how often does each url change", which is what a frontier
    generator weights fetch_order by).

    Output per url:
      n_visits     — snapshots observed;
      n_changes    — adjacent snapshot pairs whose content hash
                     differs (ordered by ``ts_col``; equal timestamps
                     break ties on the hash so reruns are
                     deterministic);
      change_frac  — n_changes / (n_visits - 1), null for single-visit
                     urls (no interval observed);
      change_rate  — the CGM-style smoothed estimator
                     -ln((intervals - changes + 0.5)/(intervals + 0.5))
                     per interval: finite even when EVERY interval
                     changed (change_frac 1.0 would naively mean an
                     infinite Poisson rate), monotone in change_frac,
                     and more visits pull it closer to the raw
                     fraction — so a 1-of-1 changer ranks below a
                     10-of-10 changer, which a bare fraction cannot
                     express. Null for single-visit urls.

    Scale shape: the history is projected to (key, ts, xxhash64) FIRST
    — page text never enters the shuffle — then ONE url-keyed exchange
    serves both the lag window and the aggregate (same clustering, no
    second Exchange; asserted in tests/test_snapshot.py). Hash
    equality carries the standard ~2^-64 per-pair collision trade the
    module docstring documents."""
    w = Window.partitionBy(key_col).orderBy(ts_col, "_h")
    slim = history.select(
        F.col(key_col).alias(key_col),
        F.col(ts_col).alias(ts_col),
        F.xxhash64(F.col(text_col)).alias("_h"),
    )
    prev = F.lag("_h").over(w)
    flagged = slim.withColumn(
        "_chg", (prev.isNotNull() & (F.col("_h") != prev)).cast("long")
    )
    agg = flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("_chg").alias("n_changes"),
    )
    intervals = (F.col("n_visits") - 1).cast("double")
    changes = F.col("n_changes").cast("double")
    return agg.select(
        key_col,
        "n_visits",
        "n_changes",
        F.when(intervals > 0, changes / intervals).alias("change_frac"),
        F.when(
            intervals > 0,
            -F.log((intervals - changes + 0.5) / (intervals + 0.5)),
        ).alias("change_rate"),
    )


def fetch_validators(
    responses: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """(url, warc_ts, etag, last_modified) — each url's LATEST capture
    validators (sources/rawfiles.read_warc_responses is the input
    shape): the conditional-GET state a recrawler echoes back as
    If-None-Match / If-Modified-Since so an unchanged page costs a
    304's headers instead of a body transfer. Joined onto
    recrawl_priority's schedule this is the complete recrawl row:
    WHEN to revisit (change_rate) and HOW to revisit cheaply
    (validators).

    Latest = max ts per url with the validator struct riding inside a
    max_by-style struct-max (ties break on the struct's remaining
    fields, deterministic) — ONE map-side-combined groupBy, the same
    single url-keyed exchange recrawl_priority pays; header strings
    only, never page bytes."""
    picked = F.max(
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col("etag").alias("etag"),
            F.col("last_modified").alias("last_modified"),
        )
    ).alias("_v")
    # key column name preserved (every sibling here does): hardcoding
    # 'url' broke the documented join onto recrawl_priority's schedule
    # for any non-default key_col (review r05)
    return (
        responses.groupBy(F.col(key_col).alias(key_col))
        .agg(picked)
        .select(
            key_col,
            F.col("_v.ts").alias(ts_col),
            F.col("_v.etag").alias("etag"),
            F.col("_v.last_modified").alias("last_modified"),
        )
    )
