"""Iceberg deploy seam (SURVEY.md §2B B2, §7 M6).

No Iceberg runtime jars ship with local PySpark (SURVEY.md §0), so
nothing here executes in the sandbox; this module pins down the exact
catalog configuration and DDL the cluster deployment uses, so the
parquet layout used locally and the Iceberg layout used in production
stay structurally identical (same columns, same partition scheme).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
#   --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog ...
CATALOG_CONFS = {
    "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.lake.type": "hadoop",  # or 'rest'/'glue' per site
    "spark.sql.catalog.lake.warehouse": "<warehouse-uri>",
    "spark.sql.defaultCatalog": "lake",
    # writes: compacted files sized for 10^12-row scans
    "spark.sql.iceberg.handle-timestamp-without-timezone": "true",
}

# Partitioning: days(warc_ts) gives dynamic partition pruning on crawl
# date; bucket(url) co-locates per-url history for the keep-latest
# dedup (B27) without a full shuffle.
PAGES_DDL = """
CREATE TABLE IF NOT EXISTS lake.crawl.pages (
  url     string,
  warc_ts timestamp,
  html    binary,
  text    string,
  lang    string)
USING iceberg
PARTITIONED BY (days(warc_ts), bucket(256, url))
TBLPROPERTIES ('write.target-file-size-bytes'='536870912',
               'write.parquet.compression-codec'='zstd')
"""

EXTRACTED_DDL = """
CREATE TABLE IF NOT EXISTS lake.crawl.extracted (
  url string, warc_ts timestamp, lang string, doctype string,
  text string,
  spans array<struct<block_id:int, start:bigint, end:bigint, kind:string>>,
  n_blocks_kept int, n_blocks_dropped int, stage_ver string, _pid int)
USING iceberg
PARTITIONED BY (days(warc_ts))
"""

LINEAGE_DDL = """
CREATE TABLE IF NOT EXISTS lake.crawl.lineage (
  run_id string, stage string, partition_id int, input_rows bigint,
  output_rows bigint, bytes_in bigint, bytes_out bigint,
  started timestamp, finished timestamp, attempt int, status string)
USING iceberg
"""


def create_tables(spark: SparkSession) -> None:
    """Run the DDL (cluster only — requires the Iceberg catalog confs)."""
    for ddl in (PAGES_DDL, EXTRACTED_DDL, LINEAGE_DDL):
        spark.sql(ddl)
