"""Bucketed-table write + shuffle-free co-located joins.

THE core 100 TB join technique this sandbox can actually demonstrate:
two fact tables bucketed by the same key into the same bucket count
sort-merge-join WITHOUT any Exchange — Spark's bucketed scan reports
`HashPartitioning(key, n)` as the scan's output partitioning, so
EnsureRequirements inserts no shuffle on either side. At 10^12 rows
this turns the nightly fact-to-fact join from the cluster's largest
shuffle (re-hashing both sides every run) into a local merge per
bucket: the shuffle is paid ONCE at write time and amortized over
every subsequent join, and bucket files are stable units for
incremental maintenance.

Design notes for the production path:
  * bucket count is a layout contract — both sides must agree (or be
    integer multiples, which Spark coalesces when
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on);
  * ``sortBy(key)`` at write time lets the merge side skip its Sort
    when each bucket holds one file (Spark reads multi-file buckets
    as unsorted) — compact buckets before relying on it;
  * the same layout serves bucket-pruned point lookups
    (``spark.sql.sources.bucketing.enabled``) and one-side-bucketed
    joins (only the unbucketed side shuffles);
  * on Iceberg the equivalent is a ``bucket(n, key)`` partition
    transform + storage-partitioned joins (sources/iceberg.py seam).

Everything here is the public DataFrameWriter bucketBy API over the
session catalog; tests/test_bucketed_join.py pins the zero-Exchange
plan shape and result parity against the plain shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table.

    One shuffle-by-key now; none on any future co-bucketed join. When
    ``path`` is given the table is external (data at ``path``, layout
    metadata in the session catalog — bucketing info lives in the
    catalog, which is why plain ``spark.read.parquet`` on the same
    files would NOT get the shuffle-free join).
    """
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    The broadcast path is disabled via a join-level SHUFFLE_MERGE hint
    (not a session conf): the point of the bucketed layout is the
    merge join that needs NO Exchange on either side, and a broadcast
    would mask a layout regression silently.
    """
    left = spark.table(left_table)
    right = spark.table(right_table).hint("SHUFFLE_MERGE")
    return left.join(right, key, how)
