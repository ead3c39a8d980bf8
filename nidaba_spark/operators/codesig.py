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

Multiline caveat pinned by tests: Java's ``(?m)^`` matches after any
of its five line terminators — ``\\r``, ``\\r\\n``, NEL (U+0085), LS
(U+2028), PS (U+2029) — while RE2's matches only after ``\\n``, so
every multiline pattern here runs on a line-normalized copy (all five
-> ``\\n``) — the same class of divergence as the sentence splitter's
\\x0B rule (textstats._WS_CLASS).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _count_matches as _count

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


# Java (?m)^ line terminators that RE2 does not recognize: CRLF, bare
# CR, NEL, LS, PS — all folded to \n before any (?m) pattern runs.
_LINE_NORM_RE = "\r\n|[\r\u0085\u2028\u2029]"


def code_signal_cols(text: Column) -> list[Column]:
    """Codegen columns: n_code_lines, n_text_lines, indent_frac,
    n_fenced_blocks, code_punct_frac, kw_hits, kw_density, code_score,
    is_code.

    ``code_score`` (higher = more code-like) averages four capped
    components — indent fraction, punctuation density, keyword
    density, fenced-block presence — so prose with one stray brace
    can't tip it; ``is_code`` thresholds at 0.5 (two strong signals).
    """
    t = F.regexp_replace(text, _LINE_NORM_RE, "\n")
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
    # Score in EXACT integer 1/10000 units, one double division at the
    # end, NO final round: summing four already-rounded doubles and
    # round()ing the mean diverges across engines near representational
    # ties (Spark rounds BigDecimal.valueOf's shortest-repr of the
    # double, DuckDB rounds value*10^4 — 0.42975-vs-0.42974999... gave
    # 0.4298 vs 0.4297, caught by the planted-feature oracle). Each
    # frac is a 4-decimal-rounded double, so round(frac*10000) recovers
    # its exact integer in both engines; everything after is integer
    # arithmetic and the final /40000.0 is the same IEEE double.
    iu = F.round(indent_frac * 10000).cast("long")
    pu = F.round(code_punct_frac * 10000).cast("long")
    ku = F.round(kw_density * 10000).cast("long")
    fu = F.least(n_fenced_blocks.cast("long"), F.lit(1)) * 10000
    units = (
        F.least(iu * 3, F.lit(10000))
        + F.least(pu * 12, F.lit(10000))
        + F.least(ku * 15, F.lit(10000))
        + fu
    )
    score = (units / F.lit(40000.0)).alias("code_score")
    return [
        n_code_lines.alias("n_code_lines"),
        n_text_lines.cast("int").alias("n_text_lines"),
        indent_frac.alias("indent_frac"),
        n_fenced_blocks.alias("n_fenced_blocks"),
        code_punct_frac.alias("code_punct_frac"),
        kw_hits.alias("kw_hits"),
        kw_density.alias("kw_density"),
        score.alias("code_score"),
        (units >= 20000).alias("is_code"),
    ]


def code_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document code-signal table. One narrow codegen scan."""
    return docs.select(F.col(id_col), *code_signal_cols(F.col(text_col)))
