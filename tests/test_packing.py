"""Sequence packing (operators/packing.py).

  * oracle: the distributed prefix sum must equal DuckDB's GLOBAL
    window (sum OVER (ORDER BY doc_id)) — same numbers, computed
    scalably.
  * plan shape: the Spark plan must contain NO single-partition
    exchange (the global-window antipattern the operator exists to
    avoid); every window is partitioned.
  * invariance: partition count must not change the result.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators import packing
from nidaba_spark.operators.textstats import token_count_ws

SF_DIR = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")
BUDGET = 1024

ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS n_tokens
  FROM '{os.path.join(SF_DIR, "documents.parquet")}'),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
  FROM t)
SELECT doc_id, n_tokens, tokens_before,
       CAST(floor(tokens_before / {BUDGET}) AS BIGINT) AS pack_id,
       CAST(row_number() OVER (
         PARTITION BY floor(tokens_before / {BUDGET}) ORDER BY doc_id) - 1
         AS INT) AS pack_pos
FROM c
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_global_window_oracle(spark, docs):
    got = _spark_rows(
        packing.pack_assignments(docs, token_count_ws(F.col("text")), BUDGET)
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(ORACLE).fetchall())
    assert got == want


def test_partition_count_invariance(spark, docs):
    a = _spark_rows(
        packing.pack_assignments(docs, token_count_ws(F.col("text")), BUDGET, npartitions=3)
    )
    b = _spark_rows(
        packing.pack_assignments(docs, token_count_ws(F.col("text")), BUDGET, npartitions=17)
    )
    assert a == b


def test_no_single_partition_window(spark, docs):
    df = packing.pack_assignments(docs, token_count_ws(F.col("text")), BUDGET)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_packs_respect_budget_structure(spark, docs):
    """Every pack's first doc starts strictly inside its budget slot,
    and tokens_before is exactly the running sum (internal
    consistency without the oracle)."""
    rows = packing.pack_assignments(
        docs, token_count_ws(F.col("text")), BUDGET
    ).orderBy("doc_id").collect()
    acc = 0
    for r in rows:
        assert r["tokens_before"] == acc
        assert r["pack_id"] == acc // BUDGET
        acc += r["n_tokens"]


def test_shard_assign_is_a_permutation(spark, docs):
    from nidaba_spark.operators.packing import shard_assign

    out = shard_assign(docs.select("doc_id"), 8).collect()
    n = len(out)
    assert n == docs.count()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(8))
    # positions are a dense 0-based range per shard
    for sid, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), sid
    # balanced within ~5 sigma of binomial expectation
    exp = n / 8
    sigma = (n * (1 / 8) * (7 / 8)) ** 0.5
    for sid in range(8):
        assert abs(len(by_shard.get(sid, [])) - exp) < 5 * sigma


def test_shard_assign_partitioning_invariant(spark, docs):
    from nidaba_spark.operators.packing import shard_assign

    a = sorted(tuple(r) for r in shard_assign(docs.select("doc_id"), 8).collect())
    b = sorted(
        tuple(r)
        for r in shard_assign(docs.select("doc_id").repartition(3), 8).collect()
    )
    assert a == b
    # a different salt draws a genuinely different permutation
    c = sorted(
        tuple(r)
        for r in shard_assign(docs.select("doc_id"), 8, salt="epoch2").collect()
    )
    assert a != c


def test_write_shards_layout(spark, docs, tmp_path):
    import os

    from nidaba_spark.operators.packing import shard_assign, write_shards

    path = str(tmp_path / "shards")
    write_shards(
        docs.select("doc_id"), path, 4, max_records_per_file=40
    )
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
    assert len(dirs) == 4
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    want = {
        (r["doc_id"], r["shard_id"], r["shard_pos"])
        for r in shard_assign(docs.select("doc_id"), 4).collect()
    }
    got = {
        (r["doc_id"], int(r["shard_id"]), r["shard_pos"]) for r in back.collect()
    }
    assert got == want
    # maxRecordsPerFile actually split the sorted stream
    files = [
        f
        for f in os.listdir(os.path.join(path, dirs[0]))
        if f.endswith(".parquet")
    ]
    assert len(files) > 1


def test_curriculum_order_semantics(spark):
    from pyspark.sql import functions as F

    from nidaba_spark.operators.packing import curriculum_order

    rows = [
        (0, 100, 0.9), (0, 50, 0.7),   # pack 0: mean 0.8
        (1, 80, 0.2), (1, 80, 0.4),    # pack 1: mean 0.3
        (2, 10, 0.55),                 # pack 2: mean 0.55
        (3, 10, 0.55),                 # pack 3: tie with 2 → id order
    ]
    df = spark.createDataFrame(rows, "pack_id long, n_tokens long, quality double")
    asc = {r["pack_id"]: r for r in curriculum_order(df).collect()}
    assert [asc[p]["curriculum_pos"] for p in (1, 2, 3, 0)] == [0, 1, 2, 3]
    assert asc[0]["mean_score"] == 0.8 and asc[0]["pack_tokens"] == 150
    assert asc[1]["n_docs"] == 2
    desc = {
        r["pack_id"]: r["curriculum_pos"]
        for r in curriculum_order(df, descending=True).collect()
    }
    assert [desc[p] for p in (0, 2, 3, 1)] == [0, 1, 2, 3]


def test_curriculum_order_matches_global_window_rank(spark):
    # r06: the range-partitioned rank (partition-local row_number +
    # driver offsets) must equal the old single-partition global
    # window bit-for-bit — across many range partitions, with heavy
    # mean_score ties straddling partition boundaries, both orders.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nidaba_spark.operators.packing import curriculum_order

    rows = [
        # 400 packs; scores collide in groups of 8 so range boundaries
        # land inside tie runs and only pack_id breaks the order
        (p, d, 10 + d, float((p // 8) % 13) / 13.0)
        for p in range(400)
        for d in range(3)
    ]
    df = spark.createDataFrame(
        rows, "pack_id long, doc long, n_tokens long, quality double"
    )
    for descending in (False, True):
        got = curriculum_order(df, descending=descending)
        key = F.desc("mean_score") if descending else F.asc("mean_score")
        ref = (
            df.groupBy("pack_id")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_tokens").alias("pack_tokens"),
                F.round(F.avg("quality"), 6).alias("mean_score"),
            )
            .withColumn(
                "curriculum_pos",
                F.row_number().over(Window.orderBy(key, F.asc("pack_id")))
                - F.lit(1),
            )
        )
        assert got.schema == ref.schema
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, ref.collect())
        )
