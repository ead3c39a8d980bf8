"""Unicode normalization operator + soft-dedup weights.

The NFC form is byte-exactly oracled against DuckDB's nfc_normalize
(plans/trainingdata.q_unicode_nfc via test_offdriver_oracles); these
tests pin the forms DuckDB lacks (NFKC/NFD/NFKD) against
unicodedata.normalize directly, plus the operator contracts.
"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators.dedup import soft_dedup_weights
from nidaba_spark.operators.unicodenorm import unicode_normalize

CASES = [
    "plain ascii only",
    "café decomposed",          # combining acute -> U+00E9
    "ǟb stacked marks",   # diaeresis+macron
    "é composed already",        # NFC fixed point
    "ﬁnal ligature",             # NFKC folds, NFC keeps
    "① circled one",             # NFKC -> '1'
    "ＨＩ fullwidth",         # NFKC -> 'HI'
    "",
    None,
]


@pytest.mark.parametrize("form", ["NFC", "NFKC", "NFD", "NFKD"])
def test_matches_unicodedata(spark, form):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "id long, text string"
    )
    got = {
        r["id"]: r["text"]
        for r in unicode_normalize(df, "text", form).collect()
    }
    for i, t in enumerate(CASES):
        want = None if t is None else unicodedata.normalize(form, t)
        assert got[i] == want, (form, t, got[i], want)


def test_idempotent_and_exchange_free(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES) if t], "id long, text string"
    )
    once = unicode_normalize(df, "text", "NFKC")
    twice = unicode_normalize(once, "text", "NFKC")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )
    plan = once._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_form_rejected(spark):
    df = spark.range(1).withColumn("text", F.lit("x"))
    with pytest.raises(ValueError):
        unicode_normalize(df, "text", "NFX")


def test_soft_dedup_family_mass(spark):
    rows = [
        (1, "dup family", 10),
        (2, "dup family", 20),
        (3, "dup family", 30),
        (4, "unique a", 7),
        (5, "unique b", 9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tok long")
    out = soft_dedup_weights(df, tokens_col_name="n_tok").collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["family_size"] == 3 and by_id[4]["family_size"] == 1
    # each family's weights sum to 1.0 (the family is the sampling unit)
    fam_w = sum(r["weight"] for r in out if r["family_size"] == 3)
    assert abs(fam_w - 1.0) < 1e-5
    assert by_id[4]["weight"] == 1.0
    # eff_tokens spreads the copy's own token count over the family
    assert abs(by_id[2]["eff_tokens"] - 20 / 3) < 1e-5
    assert by_id[5]["eff_tokens"] == 9.0


def test_soft_dedup_no_window_over_corpus(spark):
    """The family count must come from a map-side-combinable hash agg
    + join-back, not a Window over the raw rows (which would ship a
    mega-family to one partition with no partial aggregation)."""
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1)], "doc_id long, text string, n_tok long"
    )
    plan = (
        soft_dedup_weights(df, tokens_col_name="n_tok")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()
