"""Code-content signal: how much of a document is source code.

Training-data mixers need a cheap, deterministic code-vs-prose signal
long before any learned classifier exists — StarCoder/The-Stack-style
pipelines route documents by it (keep, reroute to a code subset, or
down-weight in the language mix). This module computes the classic
shallow features as pure whole-stage-codegen expressions: fenced
``` blocks, indented code lines, code-punctuation density, and a
programming-keyword density, combined into a bounded ``code_score``.

Scale shape: one narrow codegen projection over the text column —
zero shuffles, zero Python, composable into annotate()'s one-scan
pass. Every regex is in the Java-regex ∩ RE2 subset so the DuckDB
oracle (plans/trainingdata.q_code_stats) runs IDENTICAL patterns.

Multiline caveat pinned by tests: Java's ``(?m)^`` matches after
``\\r`` as well as ``\\n`` while RE2's matches only after ``\\n``, so
every multiline pattern here runs on a CR-normalized copy
(``\\r\\n?`` -> ``\\n``) — the same class of divergence as the
sentence splitter's \\x0B rule (textstats._WS_CLASS).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# line starts with a tab or >=4 spaces, then a non-space char: the
# Markdown indented-code convention. No lookarounds (RE2 has none).
_INDENT_LINE_RE = "(?m)^(?:\t|    )[ \t]*[^ \t\n][^\n]*"
# any non-empty line (denominator for indent_frac)
_NONEMPTY_LINE_RE = "(?m)^[^\n]*[^ \t\n][^\n]*"
# language-agnostic keyword set; \b is ASCII word boundary in both
# engines. Matched on the LOWERCASED text.
_KEYWORDS = (
    "def|return|import|include|function|public|static|void|struct|"
    "class|const|elif|lambda|printf|endif|typedef|nullptr|println"
)
_KW_RE = f"\\b(?:{_KEYWORDS})\\b"
# code punctuation: braces, brackets, semicolons, operators
_CODE_PUNCT_CLASS = "[{}\\[\\]();=<>]"


def _count(s: Column, pat: str) -> Column:
    """Non-overlapping match count via the replace-length trick
    (textstats._count_matches rationale). Patterns must not match
    empty — all of ours require at least one char."""
    return F.length(F.regexp_replace(s, pat, "x")) - F.length(
        F.regexp_replace(s, pat, "")
    )


def code_signal_cols(text: Column) -> list[Column]:
    """Codegen columns: n_code_lines, n_text_lines, indent_frac,
    n_fenced_blocks, code_punct_frac, kw_hits, kw_density, code_score,
    is_code.

    ``code_score`` (higher = more code-like) averages four capped
    components — indent fraction, punctuation density, keyword
    density, fenced-block presence — so prose with one stray brace
    can't tip it; ``is_code`` thresholds at 0.5 (two strong signals).
    """
    t = F.regexp_replace(text, "\r\n?", "\n")
    lower = F.lower(t)
    n_chars = F.greatest(F.length(t), F.lit(1))
    n_words = F.greatest(_count(t, "[^ \t\n]+"), F.lit(1))
    n_code_lines = _count(t, _INDENT_LINE_RE).cast("int")
    n_text_lines = F.greatest(_count(t, _NONEMPTY_LINE_RE), F.lit(1))
    indent_frac = F.round(
        n_code_lines.cast("double") / n_text_lines.cast("double"), 4
    )
    # floor, NOT cast(double->int): Spark's cast truncates but
    # DuckDB's CAST rounds-to-nearest — floor() agrees in both
    n_fenced_blocks = F.floor(_count(t, "```") / 2).cast("int")
    code_punct_frac = F.round(
        _count(t, _CODE_PUNCT_CLASS).cast("double") / n_chars.cast("double"), 4
    )
    kw_hits = _count(lower, _KW_RE).cast("int")
    kw_density = F.round(
        kw_hits.cast("double") / n_words.cast("double"), 4
    )
    score = F.round(
        (
            F.least(indent_frac * 3.0, F.lit(1.0))
            + F.least(code_punct_frac * 12.0, F.lit(1.0))
            + F.least(kw_density * 15.0, F.lit(1.0))
            + F.least(n_fenced_blocks.cast("double"), F.lit(1.0))
        )
        / 4.0,
        4,
    )
    return [
        n_code_lines.alias("n_code_lines"),
        n_text_lines.cast("int").alias("n_text_lines"),
        indent_frac.alias("indent_frac"),
        n_fenced_blocks.alias("n_fenced_blocks"),
        code_punct_frac.alias("code_punct_frac"),
        kw_hits.alias("kw_hits"),
        kw_density.alias("kw_density"),
        score.alias("code_score"),
        (score >= 0.5).alias("is_code"),
    ]


def code_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document code-signal table. One narrow codegen scan."""
    return docs.select(F.col(id_col), *code_signal_cols(F.col(text_col)))
