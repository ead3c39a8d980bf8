"""Dataset card (nidaba_spark/report.py): exact hand-corpus numbers,
HLL distinct-token estimate sane, grouping sections present/absent by
schema, and the job count stays bounded."""

from __future__ import annotations

from nidaba_spark.report import corpus_report


def test_report_hand_corpus(spark):
    rows = [
        (1, "alpha beta beta", "en", "web", 0.9),
        (2, "alpha beta beta", "en", "web", 0.8),   # exact dup of 1
        (3, "gamma delta", "de", "web", 0.4),
        (4, "", "de", "books", 0.1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, quality double"
    )
    card = corpus_report(docs)
    assert card["rows"] == 4
    assert card["total_ws_tokens"] == 3 + 3 + 2 + 0
    assert card["total_regex_tokens"] == 8
    assert card["distinct_texts"] == 3
    assert card["exact_dup_rate"] == 0.25
    # 5 distinct tokens; HLL is exact at this cardinality
    assert abs(card["distinct_tokens_est"] - 5) <= 1
    assert card["by_lang"]["en"] == {"rows": 2, "tokens": 6}
    assert card["by_source"]["books"] == {"rows": 1, "tokens": 0}
    assert card["quality"]["mean"] == round((0.9 + 0.8 + 0.4 + 0.1) / 4, 4)
    assert set(card["doc_bytes_quantiles"]) == {"p10", "p25", "p50", "p75", "p90"}


def test_report_skips_absent_groupings_and_quality(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    card = corpus_report(docs)
    assert "by_lang" not in card and "by_source" not in card
    assert "quality" not in card
    assert card["rows"] == 1 and card["exact_dup_rate"] == 0.0
