"""One-scan tagger pass (nidaba_spark/annotate.py).

The end-to-end composition is DuckDB-oracled (q_annotate,
tests/test_offdriver_oracles.py); these tests pin the plan shape and
the per-family parity against the standalone operators the pass
re-expresses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nidaba_spark.annotate import annotate
from nidaba_spark.operators.filters import c4_clean, gopher_quality_flags
from nidaba_spark.operators.textstats import script_counts

ROWS = [
    (1, "The quick brown fox jumps over the lazy dog near the bank of the"
        " river and it keeps going with plenty of common words to have.\n"
        "A second proper sentence sits on its own line right here today.\n"
        "A third good sentence keeps the document above the minimum."),
    (2, "- bullet one\n- bullet two\n- bullet three"),
    (3, "short { brace doc"),
    (4, "привет мир всем людям"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_single_scan_no_exchange(spark):
    out = annotate(_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.count() == len(ROWS)  # one row per doc, empty included


def test_gopher_family_matches_standalone(spark):
    df = _df(spark)
    ann = {r["doc_id"]: r for r in annotate(df).collect()}
    ref = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    for i in ann:
        for a_col, r_col in [
            ("gopher_n_words", "n_words"),
            ("gopher_mean_word_len", "mean_word_len"),
            ("symbol_ratio", "symbol_ratio"),
            ("bullet_line_frac", "bullet_line_frac"),
            ("ellipsis_line_frac", "ellipsis_line_frac"),
            ("alpha_word_frac", "alpha_word_frac"),
            ("n_required_stopwords", "n_required_stopwords"),
            ("gopher_keep", "gopher_keep"),
        ]:
            assert ann[i][a_col] == ref[i][r_col], (i, a_col)


def test_c4_family_matches_standalone_and_text_untouched(spark):
    df = _df(spark)
    ann = {r["doc_id"]: r for r in annotate(df).collect()}
    ref = {r["doc_id"]: r for r in c4_clean(df).collect()}
    for i in ann:
        assert ann[i]["c4_n_lines"] == ref[i]["n_lines"]
        assert ann[i]["c4_n_kept_lines"] == ref[i]["n_kept_lines"]
        assert ann[i]["c4_n_sentences"] == ref[i]["n_sentences"]
        assert ann[i]["c4_keep"] == ref[i]["c4_keep"]
    # the signal pass must NOT rewrite the text the way c4_clean does:
    # doc 1's n_chars equals the raw length
    assert ann[1]["n_chars"] == len(ROWS[0][1])


def test_script_family_matches_standalone(spark):
    df = _df(spark)
    ann = {r["doc_id"]: r for r in annotate(df).collect()}
    ref = {r["doc_id"]: r for r in script_counts(df).collect()}
    for i in ann:
        assert ann[i]["n_latin"] == ref[i]["n_latin"]
        assert ann[i]["n_cyrillic"] == ref[i]["n_cyrillic"]
        assert ann[i]["dominant_script"] == ref[i]["dominant_script"]
    assert ann[4]["dominant_script"] == "cyrillic"
    assert ann[5]["dominant_script"] == "none"


def test_signals_then_filter_equals_curate_style_filter(spark):
    """The architecture claim: filtering on the persisted signal table
    picks exactly the docs a direct filter would."""
    df = _df(spark)
    sig = annotate(df)
    from nidaba_spark.operators.textstats import with_quality

    via_signals = {
        r["doc_id"]
        for r in sig.filter(F.col("c4_keep") & (F.col("quality") > 0.3))
        .select("doc_id").collect()
    }
    # the direct side computes quality INDEPENDENTLY of annotate()
    # (with_quality over the raw docs), so a scoring bug in the
    # signal pass cannot cancel out of both sides (review r05)
    direct = {
        r["doc_id"]
        for r in c4_clean(df).filter("c4_keep").select("doc_id").collect()
    } & {
        r["doc_id"]
        for r in with_quality(df)
        .filter(F.col("quality") > 0.3).select("doc_id").collect()
    }
    assert via_signals == direct


def test_annotate_job_cli(spark, tmp_path, monkeypatch):
    """jobs/annotate_corpus.py end-to-end over a docs parquet with a
    string id column."""
    import runpy
    import sys as _sys

    src = str(tmp_path / "docs")
    out = str(tmp_path / "signals")
    spark.createDataFrame(
        [("https://a.com/1", "Some honest text with several words here."),
         ("https://a.com/2", "Another page body.")],
        "url string, text string",
    ).write.parquet(src)
    monkeypatch.setattr(
        _sys, "argv",
        ["annotate_corpus.py", "--input", src, "--output", out,
         "--id-col", "url"],
    )
    runpy.run_path("jobs/annotate_corpus.py", run_name="__main__")
    got = spark.read.parquet(out)
    assert "url" in got.columns and got.count() == 2
    assert {"quality", "c4_keep", "gopher_keep", "dominant_script"} <= set(
        got.columns
    )
