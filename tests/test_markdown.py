"""Pins operators/markdown.py semantics the DuckDB oracle can't reach
(the full-fixture oracle runs in tests/test_offdriver_oracles.py /
q_extract_markdown): per-tag rendering incl. every heading level, the
pdf all-blocks path, the crawler-text fallback, and the no-Python /
no-extra-Exchange plan shape of the rendering stage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark import schemas  # noqa: E402
from nidaba_spark.operators.markdown import markdown_stage  # noqa: E402

TS = __import__("datetime").datetime(2024, 1, 1)


def _block(i, tag, text, n_words=20, ld=0.0):
    return (i, tag, 1, text, len(text), n_words, 0, 0, 0, ld, float(n_words))


def _seg(spark, rows):
    return spark.createDataFrame(rows, schemas.SEGMENTED)


def _row(url, doctype, blocks, fallback=None):
    return (url, TS, "en", doctype, "utf-8", 100, 7, fallback, blocks, 0)


def test_rendering_per_tag(spark):
    blocks = [
        _block(0, "h1", "One"),
        _block(1, "h2", "Two"),
        _block(2, "h3", "Three"),
        _block(3, "h4", "Four"),
        _block(4, "h5", "Five"),
        _block(5, "h6", "Six"),
        _block(6, "li", "item"),
        _block(7, "blockquote", "quoted"),
        _block(8, "pre", "code here"),
        _block(9, "p", "plain para"),
        _block(10, "td", "cell"),
    ]
    [r] = markdown_stage(_seg(spark, [_row("u", "html", blocks)])).collect()
    assert r["markdown"] == (
        "# One\n\n## Two\n\n### Three\n\n#### Four\n\n##### Five\n\n"
        "###### Six\n\n- item\n\n> quoted\n\n```\ncode here\n```\n\n"
        "plain para\n\ncell"
    )
    assert r["n_blocks_kept"] == 11


def test_boilerplate_dropped_same_rule_as_classify(spark):
    # high link density drops; a 1-word block after a nav fails the
    # high-link arm (curr 1<=40, next 17<=17); the 17-word body clears
    # curr>16 on its own.
    blocks = [
        _block(0, "li", "nav", n_words=1, ld=1.0),
        _block(1, "p", "lonely", n_words=1),
        _block(2, "p", "body " * 17, n_words=17),
    ]
    [r] = markdown_stage(_seg(spark, [_row("u", "html", blocks)])).collect()
    assert r["n_blocks_kept"] == 1
    assert r["markdown"].startswith("body")


def test_pdf_blocks_render_as_plain_paragraphs(spark):
    blocks = [
        _block(0, "pdf_line", "first line", n_words=2),
        _block(1, "pdf_line", "second line", n_words=2),
    ]
    [r] = markdown_stage(_seg(spark, [_row("u", "pdf", blocks)])).collect()
    assert (r["markdown"], r["n_blocks_kept"]) == ("first line\n\nsecond line", 2)


def test_fallback_to_crawler_text(spark):
    [r] = markdown_stage(
        _seg(spark, [_row("u", "html", [], fallback="crawler text")])
    ).collect()
    assert (r["markdown"], r["n_blocks_kept"]) == ("crawler text", 1)
    # empty fallback -> empty markdown, 0 kept
    [r0] = markdown_stage(_seg(spark, [_row("u", "html", [], fallback="")])).collect()
    assert (r0["markdown"], r0["n_blocks_kept"]) == ("", 0)


def test_plan_no_python_no_exchange(spark):
    df = markdown_stage(_seg(spark, [_row("u", "html", [_block(0, "p", "x")])]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in ("Exchange", "ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert op not in plan, f"{op} leaked into the markdown render:\n{plan}"


def test_pipeline_markdown_byproduct(spark, pages_path, tmp_path):
    """Pipeline.markdown() renders off the SEGMENT checkpoint with no
    re-parse and matches extract_markdown() on the same pages row for
    row; before run() it refuses."""
    import pytest

    from nidaba_spark import pipeline
    from nidaba_spark.operators.markdown import extract_markdown

    pages = spark.read.parquet(pages_path)
    p = pipeline.Pipeline(spark, str(tmp_path), run_id="md")
    with pytest.raises(RuntimeError):
        p.markdown()
    p.run(pages)
    got = sorted(tuple(r) for r in p.markdown().collect())
    want = sorted(tuple(r) for r in extract_markdown(pages).collect())
    assert got == want and got
    # zero Python, zero Exchange on top of the checkpoint scan
    plan = p.markdown()._jdf.queryExecution().executedPlan().toString()
    for op in ("Exchange", "ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert op not in plan


def test_pre_fence_grows_past_content_backticks(spark):
    # CommonMark: the fence must be longer than any backtick run in
    # the content — a pre block documenting Markdown itself (contains
    # ```) must not close its own fence early
    blocks = [
        _block(0, "pre", "use ``` to open and ````raw```` to nest"),
        _block(1, "pre", "no ticks at all"),
    ]
    [r] = markdown_stage(_seg(spark, [_row("u", "html", blocks)])).collect()
    assert r["markdown"] == (
        "`````\nuse ``` to open and ````raw```` to nest\n`````"
        "\n\n```\nno ticks at all\n```"
    )


def test_fused_decode_segment_equals_staged(spark, pages_path):
    # r06 optimization: decode+segment fused into one Python pass for
    # extract_markdown — must stay byte-identical to the staged
    # composition (same loop bodies, same partitioning, same _pid)
    from nidaba_spark.operators.decode import decode_stage
    from nidaba_spark.operators.segment import decode_segment_stage, segment_stage
    from nidaba_spark.pipeline import prepare

    pages = spark.read.parquet(pages_path).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    prepared = prepare(pages, nsalt=16, npartitions=4)
    staged = sorted(map(repr, segment_stage(decode_stage(prepared)).collect()))
    fused = sorted(map(repr, decode_segment_stage(prepared).collect()))
    assert staged and staged == fused
