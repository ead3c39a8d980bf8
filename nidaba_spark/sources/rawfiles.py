"""Raw-crawl ingestion: a directory of page files → the pages schema.

The web-scale shape (SURVEY.md §2B B3): WARC-split drops land as raw
files; `spark.read.format('binaryFile')` gives (path, modificationTime,
length, content) with the blob untouched — no decode until the
pipeline's own charset stage, which is the point (the crawler cannot
be trusted to know the encoding). Analog of nidaba's storage ingest
(reference: nidaba/storage.py StorageFile creation from uploads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_raw_pages(
    spark: SparkSession,
    path: str,
    glob: str = "*.html",
    default_lang: str = "und",
) -> DataFrame:
    """binaryFile directory → pages(url, warc_ts, html, text, lang).

    url = file path, warc_ts = file mtime, crawler text = null (the
    pipeline's fallback column is simply absent for raw drops).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(default_lang).alias("lang"),
    )
