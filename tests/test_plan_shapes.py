"""Physical-plan shape assertions (SURVEY.md §4): the optimizations we
rely on at 100 TB must be visible in the plan, not assumed.

  * predicate pushdown + column pruning reach the parquet scan,
  * small dims broadcast (no shuffle of the fact side for them),
  * the extraction pipeline contains exactly ONE exchange (the salted
    repartition) — every stage after it is narrow,
  * the html blob never crosses a stage boundary past decode.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from nidaba_spark import pipeline
from nidaba_spark.plans.relational import (
    q_pricing_summary,
    q_revenue_by_nation,
    q_top_docs_by_chars,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(q_pricing_summary(spark, SF))
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan[:2000]


def test_column_pruning_reaches_scan(spark):
    plan = _plan(q_top_docs_by_chars(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:2000]
    cols = m.group(1)
    assert "text" not in cols, f"unused wide column not pruned: {cols}"


def test_dim_joins_broadcast(spark):
    plan = _plan(q_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]


@pytest.mark.parametrize("mode", ["fused_inline", "staged"])
def test_pipeline_single_exchange(spark, pages_path, mode):
    pages = spark.read.parquet(pages_path)
    ext = pipeline.extract(pages, mode=mode)
    plan = _plan(ext)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, f"pipeline must shuffle exactly once (salted repartition), got {n_exchanges}"


def test_pruned_fused_plan_shape(spark, pages_path):
    """The text-pruned hot path (mode='fused'). Phase 1: scan WITHOUT
    the crawler text column → exactly ONE Exchange (salted repartition)
    → ONE Python stage (MapInArrow by default). Outer plan (phase 1 sits behind the
    localCheckpoint RDD): NO additional shuffle Exchange — only the
    BroadcastExchange of the skinny needy side — one fallback
    Python stage (the fallback), and no scan that re-reads html."""
    pages = spark.read.parquet(pages_path)
    from nidaba_spark.operators.fused import fused_extract_stage

    slim = pages.select("url", "warc_ts", "html", "lang")
    inner = fused_extract_stage(pipeline.prepare(slim), with_text=False)
    ip = _plan(inner)
    assert len(re.findall(r"\(\d+\) Exchange\b", ip)) == 1, ip[:2000]
    assert len(re.findall(r"\(\d+\) MapIn(?:Pandas|Arrow)\b", ip)) == 1, ip[:2000]
    m = re.search(r"ReadSchema: struct<([^>]*)>", ip)
    assert m and "text" not in m.group(1), "crawler text must be pruned from the big scan"

    op = _plan(pipeline.extract(pages, mode="fused"))
    assert len(re.findall(r"\(\d+\) Exchange\b", op)) == 0, "no extra shuffle beyond phase 1"
    assert len(re.findall(r"\(\d+\) BroadcastExchange\b", op)) == 1, op[:2000]
    assert len(re.findall(r"\(\d+\) MapIn(?:Pandas|Arrow)\b", op)) == 1  # fallback stage only
    for mm in re.finditer(r"ReadSchema: struct<([^>]*)>", op):
        assert "html" not in mm.group(1), "html must never be read twice"


def test_fallback_broadcast_guard(spark, pages_path):
    """VERDICT r03 'what's wrong' #2: the fallback-side broadcast must
    be size-guarded. Below the ceiling (default) the hint is emitted
    (one BroadcastExchange, asserted above); above it (ceiling=1 byte
    here, standing in for the 10^12-row input) NO broadcast hint is in
    the written plan — AQE picks the strategy from runtime stats — and
    the output is byte-identical either way."""
    pages = spark.read.parquet(pages_path)
    # Above the ceiling our hint disappears; at test scale Catalyst then
    # auto-broadcasts the small pages side itself (the adaptive behavior
    # we want). Disable the planner threshold too, to simulate "both
    # sides big": the plan must degrade to a shuffle join, not die.
    spark.conf.set("spark.nidaba.fallbackBroadcastCeilingBytes", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        guarded = pipeline.extract(pages, mode="fused")
        plan = _plan(guarded)
        assert not re.findall(r"\(\d+\) BroadcastExchange\b", plan), plan[:2000]
        assert re.search(r"SortMergeJoin|ShuffledHashJoin", plan), plan[:2000]
        got = {r["url"]: r["text"] for r in guarded.collect()}
    finally:
        spark.conf.unset("spark.nidaba.fallbackBroadcastCeilingBytes")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    want = {r["url"]: r["text"] for r in pipeline.extract(pages, mode="fused").collect()}
    assert got == want


def test_fused_plan_has_one_python_stage(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    plan = _plan(pipeline.extract(pages, mode="fused_inline"))
    assert len(re.findall(r"\(\d+\) MapIn(?:Pandas|Arrow)\b", plan)) == 1
    plan_staged = _plan(pipeline.extract(pages, mode="staged"))
    assert len(re.findall(r"\(\d+\) MapInPandas\b", plan_staged)) == 2


def test_html_blob_dropped_after_decode(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    prepared = pipeline.prepare(pages)
    from nidaba_spark.operators.decode import decode_stage

    decoded = decode_stage(prepared)
    assert "html" not in decoded.columns
    # downstream stages must not resurrect the blob
    ext = pipeline.transform(prepared)
    assert "html" not in ext.columns


def test_aggregate_is_partial_then_final(spark):
    plan = _plan(q_pricing_summary(spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial (map-side) + final




def test_media_stages_are_narrow(spark):
    """The multimodal stages (resize 1→1, frame-sample 1→N) must be
    scan → mapInPandas → project with NO Exchange: per-row work stays
    on the input partitioning, so at 100 TB they add zero shuffle."""
    from nidaba_spark.operators import multimodal
    from nidaba_spark.sources.tables import load

    docs = load(spark, SF, "documents")
    media = multimodal.synthesize_media(docs)
    for df in (
        multimodal.resize_media(media, 64, 64),
        multimodal.sample_frames(media, every_ms=1000),
        multimodal.extract_features(media),
    ):
        plan = _plan(df)
        assert re.findall(r"\(\d+\) MapInPandas\b", plan), plan[:1500]
        assert not re.findall(r"\(\d+\) Exchange\b", plan), plan[:1500]


def test_gram_lambdas_bind_token_array_not_inline_split(spark):
    """The n-gram/shingle transform() lambdas must slice a BOUND array
    attribute, never an inlined split() of the document: higher-order
    functions run interpreted (CodegenFallback) and re-evaluate the
    lambda subtree per element, so an inlined tokenizer is O(words²)
    per doc — one mega-page pinned a core for 5+ minutes before the
    fix. Plan contract: no optimized-plan expression may contain BOTH
    a transform/lambda and a split of the raw text."""
    from nidaba_spark.operators.dedup import minhash_signatures
    from nidaba_spark.operators.filters import decontaminate, repetition_stats
    from nidaba_spark.sources.tables import load

    docs = load(spark, SF, "documents").select(
        "doc_id", F.col("body").alias("text")
    ) if "body" in load(spark, SF, "documents").columns else load(
        spark, SF, "documents"
    )
    eval_df = docs.limit(2).select("text")
    for df in (
        repetition_stats(docs),
        decontaminate(docs, eval_df),
        minhash_signatures(docs),
    ):
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        for line in optimized.splitlines():
            # split() as a HOF's INPUT argument (evaluated once) is
            # fine and appears BEFORE its lambdafunction; the
            # quadratic pattern is split() inside a lambda BODY —
            # i.e. anywhere after the first lambdafunction(.
            if "lambdafunction(" in line:
                body = line.split("lambdafunction(", 1)[1]
                assert "split(" not in body, line[:400]
