"""AQE skew-join: the runtime complement to pipeline.prepare's
compile-time salting. A hot key that dominates one shuffle partition
is split by AdaptiveSparkPlan into sub-partitions at execution time —
the final plan carries SortMergeJoin(skew=true) — with results
identical to the unsplit join. Thresholds are lowered to make a
test-sized hot key (50% of rows on one key) cross the skew bar; on
the 10^12-row cluster the defaults (256MB/5x median) do the same for
hyper-duplicated span/gram keys (the dedup/span operators rely on
this for their join-back joins)."""

from __future__ import annotations

import contextlib
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextlib.contextmanager
def _confs(spark, kv):
    old = {}
    for k, v in kv.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_the_hot_key(spark):
    big = spark.range(500_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % 97) + 1)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
    )
    right = spark.range(98).select(
        F.col("id").alias("k"), F.lit("r").alias("rv")
    ).hint("SHUFFLE_MERGE")
    with _confs(spark, _SKEW_CONF):
        j = big.join(right, "k")
        # collect() (not count()) so THIS DataFrame's adaptive plan is
        # the one that executes and finalizes
        rows = len(j.collect())
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(mode="formatted")
        plan = buf.getvalue()
    assert rows == 500_000
    assert "isFinalPlan=true" in plan, plan[:1500]
    assert "SortMergeJoin(skew=true)" in plan, plan[:2500]
    # and the result is exactly the plain join's
    with _confs(spark, {**_SKEW_CONF, "spark.sql.adaptive.skewJoin.enabled": "false"}):
        plain = big.join(right, "k").count()
    assert plain == rows
