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


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views so SQL-API queries (grouping sets etc.) can run."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
