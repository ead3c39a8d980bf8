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
