"""One-scan corpus annotation: every scan-level quality signal as one
wide "taggers" table (the Dolma/Common-Pile architecture: run the
taggers ONCE over the raw text, persist the signals keyed by doc, and
let every downstream recipe filter on the signals table without ever
re-reading the 100 TB text column again).

This is the architectural complement to ``curate()``: curate composes
the filters lazily into one plan for a single recipe run; annotate
materializes the SIGNALS so that ten different recipes (different
thresholds, different mixes) cost ten cheap signal-table scans plus
ONE text scan total.

Signals (all computed in a single pass over the text — the plan is a
chain of narrow projections, ZERO Exchanges, plan-asserted in
tests/test_annotate.py):

  * heuristic quality features + score   (textstats.quality_*)
  * whitespace / BPE-ish token counts    (textstats.token_count_*)
  * md5 rolling document fingerprint     (textstats.fingerprint)
  * PII match counts                     (filters.pii_counts)
  * Unicode script counts + dominant     (textstats.SCRIPT_CLASSES)
  * C4 page stats + keep flag            (filters.c4_clean, on a copy
                                          — the original text column
                                          is NOT rewritten)
  * Gopher A1.1 measures + keep flag     (filters.gopher_* helpers)
  * Flesch / FK readability              (textstats.readability_cols;
                                          rd_-prefixed counters)

Name collisions between rule families are prefixed (``gopher_n_words``
is the paper's whitespace-token count; bare ``n_words`` is the
quality-feature regex-word count; ``c4_n_lines`` is the raw line
count). Signals that need a shuffle or Python (repetition fractions,
corpus-wide span stats, language ID, compression ratio, model score)
deliberately stay OUT of this pass — they are separate operators with
their own plans; annotate is the zero-shuffle core every document
pays exactly once.

The composed one-scan pass is oracle-checked end-to-end
(plans/trainingdata.q_annotate — quality + PII + scripts + C4 + Gopher
over the SAME planted text, one DuckDB query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.filters import (
    c4_clean,
    gopher_bound_cols,
    gopher_keep_col,
    gopher_measure_cols,
    pii_counts,
)
from .operators.textstats import (
    SCRIPT_CLASSES,
    dominant_script_col,
    fingerprint,
    quality_bound_cols,
    quality_feature_cols,
    quality_score_col,
    readability_cols,
    script_count_cols,
    token_count_bpe,
    token_count_ws,
)


def annotate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gopher_min_words: int = 50,
    gopher_max_words: int = 100_000,
) -> DataFrame:
    """docs → one wide per-document signal row (id + ~30 signals);
    the id column keeps its input name (doc_id, url, ...).

    Chain of three narrow projections over one scan:
      1. C4 page stats on a COPY of the text (original preserved) +
         the Gopher bound arrays + script counts;
      2. rounded Gopher measures + every scalar signal;
      3. keep flags / argmax that read the bound measure columns.
    """
    text = F.col(text_col)

    # 1 — c4_clean rewrites its text col; feed it a copy so the raw
    # text survives for the other signal families
    c4d = c4_clean(
        docs.select(
            F.col(id_col), text.alias(text_col), text.alias("_c4t")
        ),
        text_col="_c4t",
    ).select(
        id_col,
        F.col(text_col),
        F.col("n_lines").alias("c4_n_lines"),
        F.col("n_kept_lines").alias("c4_n_kept_lines"),
        F.col("n_sentences").alias("c4_n_sentences"),
        "c4_keep",
    )

    bound = c4d.select(
        id_col,
        "c4_n_lines",
        "c4_n_kept_lines",
        "c4_n_sentences",
        "c4_keep",
        *gopher_bound_cols(text),
        *script_count_cols(text),
        *quality_bound_cols(text),
    )

    # 2 — the SHARED gopher measures (filters.gopher_measure_cols —
    # single source of truth with gopher_quality_flags; the two names
    # that collide with the quality family get the gopher_ prefix)
    _GOPHER_RENAME = {
        "n_words": "gopher_n_words",
        "mean_word_len": "gopher_mean_word_len",
    }
    t = F.col("_t")
    measured = bound.select(
        id_col,
        *quality_feature_cols(),
        quality_score_col().alias("quality"),
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        fingerprint(t).alias("fingerprint"),
        *pii_counts(t),
        *[F.col(f"n_{name}") for name, _ in SCRIPT_CLASSES],
        # readability family; its word/sentence counters get the rd_
        # prefix (n_words is the quality regex-word count,
        # c4_n_sentences the C4 terminal-punct count)
        *[
            c.alias(n)
            for c, n in zip(
                readability_cols(t),
                ["rd_n_words", "rd_n_sentences", "n_syllables", "flesch", "fk_grade"],
            )
        ],
        *gopher_measure_cols(rename=_GOPHER_RENAME),
        "c4_n_lines",
        "c4_n_kept_lines",
        "c4_n_sentences",
        "c4_keep",
    )

    # 3 — flags/argmax over the bound measure columns (shared helpers)
    return measured.select(
        "*",
        dominant_script_col().alias("dominant_script"),
        gopher_keep_col(
            gopher_min_words, gopher_max_words, rename=_GOPHER_RENAME
        ).alias("gopher_keep"),
    )
