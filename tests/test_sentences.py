"""Hand-case pins for operators/textstats.sentence_split /
sentence_rows (the full-corpus identical-regex DuckDB comparison runs
in tests/test_offdriver_oracles.py): terminator runs, unterminated
tails, bare-punctuation docs, CJK terminators, whitespace
normalization, and word counts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.textstats import sentence_rows  # noqa: E402


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return sorted(tuple(r) for r in sentence_rows(df).collect())


def test_sentence_split_semantics(spark):
    got = _rows(
        spark,
        [
            "Hello world. How are you?! Fine",  # runs + unterminated tail
            "...",  # bare punctuation -> no sentences
            "一句话。第二句！Third one?",  # CJK terminators
            "  spaced\tout.\n\nnext  line. ",  # whitespace normalization
        ],
    )
    assert got == [
        (0, 0, "Hello world.", 2),
        (0, 1, "How are you?!", 3),
        (0, 2, "Fine", 1),
        (2, 0, "一句话。", 1),
        (2, 1, "第二句！", 1),
        (2, 2, "Third one?", 2),
        (3, 0, "spaced out.", 2),
        (3, 1, "next line.", 2),
    ]


def test_readability_hand_cases(spark):
    from nidaba_spark.operators.textstats import readability_cols
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0, "The cat sat. The dog ran!"),  # 6 words, 2 sents, 6 syll
            (1, ""),  # all-zero, denominators floored
            (2, "hmm grr pfft"),  # vowel-less: 0 syllables
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in df.select("doc_id", *readability_cols(F.col("text"))).collect()
    }
    w, s, y = 6, 2, 6
    flesch = round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)
    fk = round(0.39 * (w / s) + 11.8 * (y / w) - 15.59, 4)
    assert got[0] == (w, s, y, flesch, fk)
    assert got[1] == (0, 0, 0, 206.835, -15.59)
    assert got[2][:3] == (3, 1, 0)


def test_space_before_terminator_keeps_clause(spark):
    # French typographic spacing: 'bonjour !' previously matched
    # NEITHER alternative of the sentence pattern and the whole
    # clause vanished (0 sentences), not merely mis-split
    from nidaba_spark.operators.textstats import sentence_rows

    docs = spark.createDataFrame(
        [(1, "Bonjour ! Ca va ?"), (2, "Plain one. And two.")],
        "doc_id long, text string",
    )
    got = {}
    for r in sentence_rows(docs).collect():
        got.setdefault(r["doc_id"], []).append(r["sentence"])
    assert len(got[1]) == 2
    assert got[1][0].lower().startswith("bonjour")
    assert len(got[2]) == 2
