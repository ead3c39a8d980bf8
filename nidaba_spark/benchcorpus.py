"""Distributed generation of the bench-scale pages corpus.

The corpus is a pure function of row index k (corpus.make_row), so
generation parallelizes embarrassingly: spark.range(n) → mapInPandas →
parquet, cached on disk keyed by n. Heavy-tailed page sizes (mega
pages every 1009th row) make BYTES, not rows, the load unit —
FIXTURES.md §1.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import corpus, schemas


def _gen_batches(batches):
    for pdf in batches:
        rows = [corpus.make_row(int(k)) for k in pdf["id"]]
        out = pd.DataFrame(rows)
        out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
        yield out


def ensure_corpus(spark: SparkSession, n: int, cache_dir: str) -> str:
    """Generate (once) and return the path of the n-row pages parquet."""
    path = os.path.join(cache_dir, f"pages_n{n}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    df = (
        spark.range(n)
        .repartition(max(spark.sparkContext.defaultParallelism * 2, 8))
        .mapInPandas(_gen_batches, schema=schemas.PAGES)
    )
    df.write.mode("overwrite").parquet(path)
    return path


def load_pages(spark: SparkSession, n: int, cache_dir: str) -> DataFrame:
    return spark.read.schema(schemas.PAGES).parquet(ensure_corpus(spark, n, cache_dir))
