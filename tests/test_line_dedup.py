"""Intra-document line dedup (operators/filters
.dedup_lines_within_doc): exact hand cases, idempotence, the
zero-shuffle plan shape, and the curate(line_dedup=True) wiring.

Full DuckDB oracle parity for q_line_dedup runs in
tests/test_offdriver_oracles.py like every other off-driver query.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.filters import dedup_lines_within_doc  # noqa: E402


def _clean(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in dedup_lines_within_doc(df).collect()}


def test_first_occurrence_kept_whitespace_survives(spark):
    got = _clean(spark, [(1, "a b\nc d\na b\n\n  \nc d\nx")])[1]
    assert got["text"] == "a b\nc d\n\n  \nx"
    assert got["n_lines"] == 7 and got["n_removed"] == 2


def test_raw_byte_matching_no_trim_normalization(spark):
    """'  footer' and 'footer' are distinct lines — matching is exact."""
    got = _clean(spark, [(1, "footer\n  footer\nfooter")])[1]
    assert got["text"] == "footer\n  footer"
    assert got["n_removed"] == 1


def test_empty_and_single_line_docs_pass_through(spark):
    got = _clean(spark, [(1, ""), (2, "solo")])
    assert got[1]["text"] == "" and got[1]["n_removed"] == 0
    assert got[2]["text"] == "solo" and got[2]["n_removed"] == 0


def test_idempotent(spark):
    df = spark.createDataFrame(
        [(i, f"w{i}\nbp\nbp\n\nbp\nw{i} tail") for i in range(20)],
        "doc_id long, text string",
    )
    once = dedup_lines_within_doc(df).select("doc_id", "text")
    twice = dedup_lines_within_doc(once)
    assert twice.filter(F.col("n_removed") != 0).count() == 0
    assert once.exceptAll(twice.select("doc_id", "text")).count() == 0


def test_plan_is_shuffle_free(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a\nb\na").alias("text")
    )
    plan = dedup_lines_within_doc(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curate_line_dedup_stage_wired(spark, pages_path):
    """curate(line_dedup=True): survivors carry no repeated non-blank
    line, and the flag never drops documents by itself (it rewrites
    text; only fully-emptied docs drop)."""
    from nidaba_spark import curate

    pages = spark.read.parquet(pages_path).limit(120)
    base = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8
    ).select("url", "text")
    deduped = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8, line_dedup=True
    ).select("url", "text")
    # same url set modulo emptied docs (the synthetic corpus empties none)
    assert sorted(r["url"] for r in base.select("url").collect()) == sorted(
        r["url"] for r in deduped.select("url").collect()
    )
    redo = dedup_lines_within_doc(deduped)
    assert redo.filter(F.col("n_removed") != 0).count() == 0
