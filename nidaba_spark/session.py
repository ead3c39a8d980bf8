"""SparkSession factory tuned for the extraction workload.

Settings rationale (SURVEY.md §4.3):
  * Arrow batches: 1024 rows, additionally bounded by Spark 4's
    ``maxBytesPerBatch`` (64 MB default — verified empirically to
    govern mapInArrow/mapInPandas input slicing, NOTES.md r04), so a
    batch of mega-pages caps at ~16 rows while typical pages fill the
    row cap. Swept at the 1M-page corpus: 128/256/512/1024 →
    23.4/22.8/20.3/18.6 s at local[32] (−18% vs the old 256); the
    byte bound is what makes the bigger row cap memory-safe.
  * AQE on: coalesces small shuffle partitions and splits skewed ones
    (second line of defense behind our explicit length-bucket salting).
  * UTC session timezone so DuckDB oracle comparisons are stable.
  * shuffle.partitions ~ cores for local runs; a real cluster submit
    overrides via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app: str = "nidaba-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """extra_conf entries (and the NIDABA_EXTRA_CONF env var, a
    ``k=v,k=v`` list applied after them) override the defaults below —
    the A/B hook the codec/serializer experiments in
    scripts/bench_scaling.py drive without forking the factory."""
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(n, 8)))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "67108864")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
    )
    merged = dict(extra_conf or {})
    env_conf = os.environ.get("NIDABA_EXTRA_CONF", "")
    for kv in filter(None, env_conf.split(",")):
        k, _, v = kv.partition("=")
        merged[k.strip()] = v.strip()
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not create
    (e.g. the driver harness's); JVM-start-only confs are skipped."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    spark.conf.set("spark.sql.execution.arrow.maxBytesPerBatch", "67108864")
    return spark
