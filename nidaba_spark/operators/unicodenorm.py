"""Unicode normalization as a corpus transform (NFC/NFKC/NFD/NFKD).

Web crawls mix composed and decomposed codepoint sequences for the
same visible text (mojibake repairs, CMS templates emitting combining
marks, ligature codepoints from PDF extraction). Everything downstream
that keys on bytes — exact dedup, paragraph dedup, span hashing,
decontamination, BM25 terms — silently treats "é" (U+00E9) and
"é" (U+0065 U+0301) as different documents unless the corpus is
normalized first, so curation recipes (CCNet, C4, RefinedWeb) place a
Unicode normalization pass before any hashing. This operator is that
pass, Spark-shaped.

Plan (scale): one ``pandas_udf`` projection — Arrow-batched
``Series.str.normalize`` (CPython ``unicodedata.normalize``, a C
loop with its own quick-check fast path for already-normalized /
ASCII input), NO shuffle, NO Exchange anywhere in the plan; the
transform is embarrassingly parallel and pipelines into whatever
scan feeds it.

Correctness: the NFC form is oracle-checked byte-exactly against
DuckDB's ``nfc_normalize`` (plans/trainingdata.q_nfc_normalize);
NFKC/NFD/NFKD are pinned by pytest against ``unicodedata.normalize``
plus idempotence properties (tests/test_unicodenorm.py). DuckDB ships
only the NFC form, so the other three are rows-only by oracle-dialect
limitation, not by design.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def normalize_col(col: Column | str, form: str = "NFC") -> Column:
    """A Column computing ``unicodedata.normalize(form, text)`` via an
    Arrow-batched pandas UDF (nulls pass through as nulls)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        # Series.str.normalize propagates nulls and unicodedata's own
        # C-level quick-check already short-circuits ASCII/NFC-clean
        # strings — a pandas-side per-row isascii pre-mask is
        # pure overhead (review r05), so the batch goes straight in.
        return s.str.normalize(form)

    return _norm(F.col(col) if isinstance(col, str) else col)


def unicode_normalize(
    docs: DataFrame, text_col: str = "text", form: str = "NFC"
) -> DataFrame:
    """Rewrite ``text_col`` to its ``form``-normalized bytes (other
    columns untouched). Narrow — the plan contains no Exchange."""
    return docs.withColumn(text_col, normalize_col(text_col, form))
