"""Source adapters for the sandbox tables + the deploy-time Iceberg seam.

Locally everything is parquet (TESTDATA.md). On a cluster the same
call sites switch to Iceberg catalog tables — the configuration lives
in jobs/submit examples (spark-submit --packages org.apache.iceberg:
iceberg-spark-runtime), not in code, per SURVEY.md §0 environment
constraints.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one sandbox table; column pruning/pushdown flow into the scan."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_scan(
    df: DataFrame, key: str | None = None, factor: int = 2, min_bytes: int = 0
) -> DataFrame:
    """Redistribute a low-parallelism scan before compute-dense
    per-row work (guide §2.2 / §6: parquet parallelizes at row-group
    granularity, and the sandbox tables are single-file parquet with
    1-6 row groups — so a scan-rooted query's expensive stage runs
    1-6-way on a 32-core session; doc_quality measured 3.3 s
    single-task vs 0.45 s spread, r06). One narrow deterministic
    exchange moves the rows once so every downstream regex/parse pass
    uses the whole cluster.

    Scale-adaptive by construction: when the scan already yields >=
    defaultParallelism partitions (any production multi-row-group /
    multi-file table — at 100 TB a scan has 10^5+ splits), this
    returns ``df`` unchanged, so the exchange exists only in the
    regime where it buys parallelism. ``key`` picks a deterministic
    hash distribution (no round-robin local sort, no SPARK-38388
    retry hazard); unique-id keys spread evenly.

    ``min_bytes`` is the break-even gate for CHEAP-per-byte callers
    (hashing, histogramming): below it the exchange's fixed cost
    (one extra stage, cores*factor task launches) exceeds what the
    added parallelism saves, so the scan is returned unchanged.
    Measured at sf0.1 (595 KB documents): dedup_minhash_lsh 0.15 s
    unspread vs 0.35 s spread; at 10x the bytes the spread side wins
    (0.38 -> 0.23 s, r06 log). Regex-heavy callers (doc_quality's 5
    passes, sentence split) win the exchange even at 595 KB and keep
    the default 0. Plan-time file-size stats only — no action, no
    data read.
    """
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if min_bytes > 0:
        try:
            est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            est = None
        if est is not None and est < min_bytes:
            return df
    if df.rdd.getNumPartitions() >= cores:
        return df
    n = cores * factor
    if key is not None:
        from pyspark.sql import functions as F

        return df.repartition(n, F.col(key))
    return df.repartition(n)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views so SQL-API queries (grouping sets etc.) can run."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
