"""Gopher §A1.2 repetition-removal rules (operators/filters
.gopher_repetition_flags): exact hand-computed values per rule family,
threshold-boundary keep semantics, the documented unavoidable
couplings, and the curate(gopher_repetition=True) wiring.

The full DuckDB oracle parity for q_gopher_repetition runs in
tests/test_offdriver_oracles.py like every other off-driver query.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.filters import (  # noqa: E402
    GOPHER_REPETITION_THRESHOLDS,
    gopher_repetition_flags,
)


@pytest.fixture(scope="module")
def pages(spark, pages_path):
    return spark.read.parquet(pages_path)

# 40 distinct words -> no repeated n-gram, one line, one paragraph
_FILLER = " ".join(f"filler{i:02d}word" for i in range(40))


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_repetition_flags(df).collect()}


def test_dup_line_family_exact_values(spark):
    """Two identical short lines out of three: dup_line_frac = 1/3
    (occurrences beyond the first over total), char frac = extra
    chars / len(text); the single-paragraph doc keeps para stats 0."""
    text = "zz yy\nzz yy\n" + _FILLER
    got = _flags(spark, [(1, text)])[1]
    assert got["dup_line_frac"] == round(1 / 3, 4)
    assert got["dup_line_char_frac"] == round(5 / len(text), 4)
    assert got["dup_para_frac"] == 0.0 and got["dup_para_char_frac"] == 0.0
    assert got["rep_keep"] is False  # 0.3333 > 0.30


def test_dup_para_family_couples_to_lines(spark):
    """A duplicated paragraph necessarily duplicates its lines too —
    the coupling is structural, both fractions read 1/3."""
    text = "pp qq\n\npp qq\n\n" + _FILLER
    got = _flags(spark, [(2, text)])[2]
    assert got["dup_para_frac"] == round(1 / 3, 4)
    assert got["dup_line_frac"] == round(1 / 3, 4)
    assert got["dup_para_char_frac"] == round(5 / len(text), 4)
    assert got["rep_keep"] is False


def test_gram_mass_family_and_overlap_semantics(spark):
    """A pure spam run trips every gram rule; overlapping occurrences
    are counted multiply (documented), so masses exceed 1.0 — e.g.
    top2 = 29 overlapping 'spam spam' bigrams x 9 chars / 149 chars."""
    text = ("spam " * 30).strip()  # 30 words, 149 chars
    got = _flags(spark, [(3, text)])[3]
    assert got["top2_char_frac"] == round(29 * 9 / 149, 4)
    assert got["dup5_char_frac"] == round(26 * 24 / 149, 4)
    assert got["dup10_char_frac"] == round(21 * 49 / 149, 4)
    for name in GOPHER_REPETITION_THRESHOLDS:
        if name.startswith(("top", "dup5", "dup6", "dup7", "dup8", "dup9", "dup10")):
            assert got[name] > GOPHER_REPETITION_THRESHOLDS[name], name
    # one spam line/para: no line-level duplication
    assert got["dup_line_frac"] == 0.0 and got["dup_para_frac"] == 0.0
    assert got["rep_keep"] is False


def test_threshold_boundary_keeps(spark):
    """Exactly AT a threshold keeps (rules are <=): one line appearing
    4 times among 10 -> dup_line_frac = 3/10 = 0.30 exactly."""
    fillers = [
        " ".join(f"ln{i}w{j}xxxx" for j in range(8)) for i in range(6)
    ]
    text = "\n".join(fillers + ["qq rr"] * 4)
    got = _flags(spark, [(4, text)])[4]
    assert got["dup_line_frac"] == 0.3
    assert got["rep_keep"] is True


def test_clean_and_empty_docs_keep(spark):
    got = _flags(spark, [(5, _FILLER), (6, ""), (7, "one")])
    for doc_id in (5, 6, 7):
        assert got[doc_id]["rep_keep"] is True, doc_id
        for name in GOPHER_REPETITION_THRESHOLDS:
            assert got[doc_id][name] == 0.0 or doc_id == 5, (doc_id, name)
    # the clean doc's only nonzero stats are singleton top-gram masses
    assert got[5]["dup_line_frac"] == 0.0
    assert got[5]["dup5_char_frac"] == 0.0
    assert 0 < got[5]["top2_char_frac"] < 0.1


def test_rule_count_matches_published_table(spark):
    """13 rules, one column each, plus the conjunction."""
    assert len(GOPHER_REPETITION_THRESHOLDS) == 13
    df = gopher_repetition_flags(
        spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    )
    assert set(GOPHER_REPETITION_THRESHOLDS) | {"doc_id", "rep_keep"} == set(
        df.columns
    )


def test_curate_gopher_repetition_stage_wired(spark, pages):
    """curate(gopher_repetition=True) drops exactly the rep_keep=False
    docs: survivors re-pass the flags, and a planted boilerplate-heavy
    page is gone while the baseline keeps it."""
    from nidaba_spark import curate

    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        gopher_repetition=True,
    ).select("url", "text")
    base = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
    ).select("url", "text")
    assert 0 < out.count() <= base.count()
    redo = gopher_repetition_flags(out, id_col="url")
    assert redo.filter(~F.col("rep_keep")).count() == 0
