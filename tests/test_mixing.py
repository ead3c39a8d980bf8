"""Weighted source mixing (operators/mixing.py).

  * oracle: the kept set must equal DuckDB computing the SAME
    md5-derived uniform and CASE rates — full cross-engine pin of
    the sampling predicate.
  * nested subsets: tightening a rate keeps a strict subset.
  * proportions: realized rates within a tolerance of targets.
  * upsampling: copy counts match floor(rate) + bernoulli(frac).
  * determinism/partition stability: repartitioned input, same rows.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators import mixing

SF_DIR = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")

RATES = {"src0": 0.25, "src1": 1.0, "src2": 0.5}
DEFAULT = 0.75

_U_SQL = """
(list_sum(list_transform(range(1, 9), j ->
   CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), j, 1)) - 1 AS BIGINT)
   * (CAST(1 AS BIGINT) << (4 * (8 - j)))))
 / 4294967296.0)
"""

_RATE_SQL = (
    "CASE source WHEN 'src0' THEN 0.25 WHEN 'src1' THEN 1.0 "
    "WHEN 'src2' THEN 0.5 ELSE 0.75 END"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_matches_duckdb_oracle(spark, docs):
    got = sorted(
        r["doc_id"]
        for r in mixing.weighted_sample(docs, RATES, default=DEFAULT)
        .select("doc_id")
        .collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT doc_id FROM '{DOCS}' WHERE {_U_SQL} < {_RATE_SQL}"
        )
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_nested_subsets_and_proportions(spark, docs):
    half = {
        r["doc_id"]
        for r in mixing.weighted_sample(docs, {}, default=0.5)
        .select("doc_id")
        .collect()
    }
    tenth = {
        r["doc_id"]
        for r in mixing.weighted_sample(docs, {}, default=0.1)
        .select("doc_id")
        .collect()
    }
    assert tenth <= half  # tightening a rate keeps a strict subset
    n = docs.count()
    assert abs(len(half) / n - 0.5) < 0.08
    assert abs(len(tenth) / n - 0.1) < 0.05


def test_partition_stability(spark, docs):
    a = {
        r["doc_id"]
        for r in mixing.weighted_sample(docs, RATES, default=DEFAULT)
        .select("doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in mixing.weighted_sample(
            docs.repartition(13, "lang"), RATES, default=DEFAULT
        ).select("doc_id").collect()
    }
    assert a == b


def test_upsampling_copies(spark, docs):
    out = (
        mixing.weighted_copies(docs, {"src5": 2.5}, default=1.0)
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n"), F.collect_set("copy").alias("copies"))
        .collect()
    )
    for r in out:
        if r["source"] == "src5":
            assert r["n"] in (2, 3)
        else:
            assert r["n"] == 1
        assert sorted(r["copies"]) == list(range(r["n"]))  # 0-based, dense
    src5 = [r["n"] for r in out if r["source"] == "src5"]
    assert len(src5) == 25
    mean = sum(src5) / len(src5)
    assert abs(mean - 2.5) < 0.35


def test_rate_le_1_matches_sample(spark, docs):
    s = {
        r["doc_id"]
        for r in mixing.weighted_sample(docs, RATES, default=DEFAULT)
        .select("doc_id").collect()
    }
    c = {
        r["doc_id"]
        for r in mixing.weighted_copies(docs, RATES, default=DEFAULT)
        .select("doc_id").collect()
    }
    assert s == c


def test_split_assign_partition_properties(spark, docs):
    from nidaba_spark.operators.mixing import split_assign

    out = split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    rows = out.select("doc_id", "split", "source").collect()
    assert len(rows) == n  # exhaustive, one row each (disjoint by construction)
    by = {}
    for r in rows:
        by.setdefault(r["split"], []).append(r)
    # global proportions within binomial tolerance
    assert abs(len(by["train"]) / n - 0.8) < 0.08
    assert abs(len(by["val"]) / n - 0.1) < 0.06
    # stratified: per-source train share also near 0.8
    per_src = {}
    for r in rows:
        t, c = per_src.get(r["source"], (0, 0))
        per_src[r["source"]] = (t + (r["split"] == "train"), c + 1)
    for src, (t, c) in per_src.items():
        if c >= 15:
            assert abs(t / c - 0.8) < 0.25, (src, t, c)


def test_split_assign_monotone_growth(spark, docs):
    from nidaba_spark.operators.mixing import split_assign

    small = split_assign(docs, {"train": 0.7, "val": 0.2, "test": 0.1})
    big = split_assign(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    small_train = {
        r["doc_id"] for r in small.filter("split = 'train'").collect()
    }
    big_train = {r["doc_id"] for r in big.filter("split = 'train'").collect()}
    assert small_train < big_train  # strict nested growth


def test_split_assign_validates_and_deterministic(spark, docs):
    import pytest as _pytest

    from nidaba_spark.operators.mixing import split_assign

    with _pytest.raises(ValueError):
        split_assign(docs, {"train": 0.8, "val": 0.1})
    a = sorted(
        (r["doc_id"], r["split"])
        for r in split_assign(docs, {"train": 0.8, "val": 0.2}, salt="s2").collect()
    )
    b = sorted(
        (r["doc_id"], r["split"])
        for r in split_assign(
            docs.repartition(9), {"train": 0.8, "val": 0.2}, salt="s2"
        ).collect()
    )
    assert a == b


def test_sample_exact_k_properties(spark):
    from nidaba_spark.operators.mixing import sample_exact_k

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    k100 = sorted(r["doc_id"] for r in sample_exact_k(df, 100).collect())
    assert len(k100) == 100
    # deterministic under repartitioning
    again = sorted(
        r["doc_id"] for r in sample_exact_k(df.repartition(7), 100).collect()
    )
    assert k100 == again
    # growing k keeps the old sample as a subset (nested prefixes)
    k200 = set(r["doc_id"] for r in sample_exact_k(df, 200).collect())
    assert set(k100) < k200 and len(k200) == 200
    # a different salt draws an independent sample
    other = set(r["doc_id"] for r in sample_exact_k(df, 100, salt="s2").collect())
    assert other != set(k100)


def test_sample_exact_k_plan_is_top_k(spark):
    import contextlib
    import io

    from nidaba_spark.operators.mixing import sample_exact_k

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sample_exact_k(df, 100).explain(mode="formatted")
    plan = buf.getvalue()
    # per-partition heap + k-row merge, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_budget_select_boundary_and_monotone(spark):
    from nidaba_spark.operators.mixing import budget_select

    rows = [(1, 100, 0.9), (2, 100, 0.8), (3, 100, 0.7), (4, 100, 0.6)]
    df = spark.createDataFrame(rows, "doc_id long, n long, q double")

    def sel(budget):
        out = budget_select(df, F.col("n"), budget, score_col="q")
        return {r["doc_id"] for r in out.collect() if r["selected"]}

    # the doc CROSSING the budget line is included (trim-at-doc rule)
    assert sel(150) == {1, 2}
    assert sel(100) == {1}  # cum_before of doc 2 is 100, not < 100
    assert sel(1) == {1}
    assert sel(0) == set()
    assert sel(10_000) == {1, 2, 3, 4}
    # monotone in budget
    assert sel(150) <= sel(250) <= sel(350)


def test_budget_select_orders_by_score_then_id(spark):
    from nidaba_spark.operators.mixing import budget_select

    rows = [(10, 50, 0.5), (2, 50, 0.5), (7, 50, 0.9)]
    df = spark.createDataFrame(rows, "doc_id long, n long, q double")
    out = {r["doc_id"]: r for r in budget_select(df, F.col("n"), 100, score_col="q").collect()}
    assert out[7]["cum_before"] == 0
    assert out[2]["cum_before"] == 50  # tie at 0.5 → lower id first
    assert out[10]["cum_before"] == 100
    assert out[7]["selected"] and out[2]["selected"] and not out[10]["selected"]
    # decoded score survives the key round-trip
    assert out[7]["q"] == 0.9 and out[2]["q"] == 0.5


def test_budget_select_no_single_partition_window(spark):
    from nidaba_spark.operators.mixing import budget_select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = budget_select(
        docs.select("doc_id", F.col("n_chars").alias("n"),
                    (F.col("doc_id") % 100 / 100.0).alias("q")),
        F.col("n"), 5000, score_col="q",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_mixture_entropy_laws(spark):
    from math import log

    from nidaba_spark.operators.mixing import mixture_entropy

    rows = (
        [(0, "a")] * 4 + [(0, "b")] * 4  # uniform 2-key → ln 2
        + [(1, "a")] * 5                 # single key → 0
        + [(2, "a")] * 3 + [(2, "b")] * 1
    )
    df = spark.createDataFrame(
        [(g, k, i) for i, (g, k) in enumerate(rows)],
        "grp int, src string, i long",
    )
    got = {
        r["grp"]: r
        for r in mixture_entropy(df, group_col="grp", key_col="src").collect()
    }
    assert got[0]["entropy"] == round(log(2), 6) and got[0]["n_keys"] == 2
    assert got[1]["entropy"] == 0.0 and got[1]["n_keys"] == 1
    expected = -(0.75 * log(0.75) + 0.25 * log(0.25))
    assert abs(got[2]["entropy"] - expected) < 1e-6
    assert got[0]["n"] == 8 and got[1]["n"] == 5 and got[2]["n"] == 4


def test_budget_select_grouped_laws(spark):
    from nidaba_spark.operators.mixing import budget_select_grouped
    from pyspark.sql import functions as F

    rows = [
        ("en", 1, 40, 0.9), ("en", 2, 40, 0.8), ("en", 3, 40, 0.7),
        ("de", 4, 40, 0.95), ("de", 5, 40, 0.5),
        ("xx", 6, 40, 1.0),  # no budget entry -> never selected
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long, q double")
    out = {
        r["doc_id"]: r
        for r in budget_select_grouped(
            df, F.col("n"), {"en": 80, "de": 40}, score_col="q"
        ).collect()
    }
    # en: docs 1,2 fill the 80-token budget; doc 3 starts at 80 -> out
    assert [out[i]["selected"] for i in (1, 2, 3)] == [True, True, False]
    assert out[3]["cum_before"] == 80
    # de: independent budget and cumsum (de's best doc starts at 0)
    assert out[4]["selected"] and out[4]["cum_before"] == 0
    assert not out[5]["selected"]
    # absent group -> budget 0, trim-at-doc rule still reports cumsum
    assert not out[6]["selected"] and out[6]["cum_before"] == 0
    # group independence: inflating en CANNOT change de's selection
    more = spark.createDataFrame(
        [("en", 7, 1000, 0.99)], "source string, doc_id long, n long, q double"
    )
    out2 = {
        r["doc_id"]: r["selected"]
        for r in budget_select_grouped(
            df.union(more), F.col("n"), {"en": 80, "de": 40}, score_col="q"
        ).collect()
    }
    assert out2[4] and not out2[5]
    assert out2[7] and not out2[1]  # en's budget now eaten by doc 7


def test_budget_select_grouped_uniform_budget_and_plan(spark):
    from nidaba_spark.operators.mixing import budget_select_grouped
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        (F.col("id") % 5).cast("string").alias("source"),
        F.col("id").alias("doc_id"),
        F.lit(10).alias("n"),
        (F.col("id") % 7 / 7.0).alias("q"),
    )
    out = budget_select_grouped(df, F.col("n"), 100, score_col="q")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    rows = out.collect()
    # uniform budget: every group selects exactly 10 docs (40 each)
    import collections

    sel = collections.Counter(r["source"] for r in rows if r["selected"])
    assert sel == {str(g): 10 for g in range(5)}


def test_budget_select_grouped_null_group_kept(spark):
    """A NULL group (missing source) is a group of its own — the
    offsets join must be null-safe, never dropping those rows
    (review r05)."""
    from nidaba_spark.operators.mixing import budget_select_grouped
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("en", 1, 10, 0.9), (None, 2, 10, 0.8), (None, 3, 10, 0.7),
         ("de", 4, 10, 0.6)],
        "source string, doc_id long, n long, q double",
    )
    out = {
        r["doc_id"]: r
        for r in budget_select_grouped(
            df, F.col("n"), {"en": 100, "de": 100}, score_col="q"
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # every input row reported
    # null group has no budget entry -> present, never selected,
    # with its OWN independent cumsum
    assert not out[2]["selected"] and not out[3]["selected"]
    assert out[2]["cum_before"] == 0 and out[3]["cum_before"] == 10
    assert out[1]["selected"] and out[4]["selected"]


def test_budget_select_null_score_is_no_information(spark):
    # a NULL quality used to produce a NULL ordering key that sorted
    # FIRST (spending budget on unscored docs) and decoded to a NULL
    # doc_id; it now coalesces to score 0.0 — ranked worst, id intact
    df = spark.createDataFrame(
        [(1, 10, 0.9), (2, 10, None), (3, 10, 0.5)],
        "doc_id long, n_tokens long, quality double",
    )
    out = {
        r["doc_id"]: r
        for r in mixing.budget_select(
            df, F.col("n_tokens"), token_budget=20, npartitions=2
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # no NULL ids
    assert out[2]["quality"] == 0.0 and out[2]["selected"] is False
    assert out[1]["selected"] and out[3]["selected"]


def test_temperature_mix_null_source(spark):
    # a NULL source used to raise TypeError (sorting None vs str
    # rate keys) or silently drop the whole null group via == NULL
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else None, 10) for i in range(40)],
        "doc_id long, source string, n_tokens long",
    )
    out = mixing.temperature_mix(
        df, token_budget=200, temperature=0.5,
        key_col="source", token_col="n_tokens",
    )
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert None in got and "en" in got  # both groups represented
