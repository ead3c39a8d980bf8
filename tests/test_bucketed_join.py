"""Bucketed co-located join: the write-once-shuffle-never layout.

Pins (a) ZERO Exchange in the physical plan of a join between two
tables bucketed by the same key into the same bucket count, (b) the
bucketed scan actually reporting its bucket layout, (c) result parity
with the plain shuffled join, and (d) the control: the same join over
the same data WITHOUT bucket metadata shuffles both sides.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.sources.bucketed import co_located_join, write_bucketed  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    write_bucketed(
        orders, "orders_b", "o_custkey", 8, path=str(base / "orders_b")
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", "o_custkey", 8, path=str(base / "customer_b"),
    )
    yield "orders_b", "customer_b", orders, customer
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_co_bucketed_join_has_zero_exchange(spark, bucketed_tables):
    lt, rt, *_ = bucketed_tables
    out = co_located_join(spark, lt, rt, "o_custkey").select(
        "o_custkey", "o_totalprice", "c_mktsegment"
    )
    plan = _plan(out)
    # merge join with NO shuffle anywhere: both scans already report
    # HashPartitioning(o_custkey, 8)
    assert "SortMergeJoin" in plan, plan[:2000]
    assert not re.findall(r"\(\d+\) Exchange\b", plan), plan[:2000]
    assert not re.findall(r"\(\d+\) BroadcastExchange\b", plan), plan[:2000]
    # the scans advertise the bucket layout
    assert re.search(r"Bucketed: true", plan), plan[:2000]


def test_unbucketed_control_shuffles_both_sides(spark, bucketed_tables):
    *_, orders, customer = bucketed_tables
    right = customer.withColumnRenamed("c_custkey", "o_custkey").hint("SHUFFLE_MERGE")
    plan = _plan(orders.join(right, "o_custkey"))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2, plan[:2000]


def test_bucket_pruned_point_lookup(spark, bucketed_tables):
    """The same layout serves point lookups: an equality filter on the
    bucket key scans 1 of 8 buckets (the scan itself advertises it).

    autoBucketedScan (default on) falls back to a plain file scan when
    no operator needs the hash distribution — for pruned point reads
    the bucketed scan must be forced (at 10^12 rows you'd keep this
    off for lookup-style jobs)."""
    from pyspark.sql import functions as F

    lt, *_ = bucketed_tables
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        plan = _plan(spark.table(lt).filter(F.col("o_custkey") == 42))
    finally:
        spark.conf.set(key, prev)
    assert re.search(r"SelectedBucketsCount: 1 out of 8", plan), plan[:2000]


def test_co_bucketed_join_result_parity(spark, bucketed_tables):
    lt, rt, orders, customer = bucketed_tables
    fast = co_located_join(spark, lt, rt, "o_custkey")
    slow = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    cols = sorted(set(fast.columns) & set(slow.columns))
    a = sorted(tuple(r) for r in fast.select(*cols).collect())
    b = sorted(tuple(r) for r in slow.select(*cols).collect())
    assert a == b and len(a) > 0
