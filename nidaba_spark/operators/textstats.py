"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Training-data-pipeline components (driver instruction). The
quality/token/fingerprint operators are pure Column expressions
(codegen'd, oracle-checkable in DuckDB); language-ID is a
character-n-gram profile scorer in an Arrow-batched pandas UDF (the
canonical heuristic needs per-string trigram loops — the one place
Python earns its keep, and it is vectorized per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import tokens_col

STOPWORDS = (
    "the a of and to in is it for on as at by an be this that with "
    "or are was not from have has but"
).split()

# Tiny deterministic trigram/stopword profiles per language. With no
# external models in the sandbox these are hand-rolled marker sets —
# the operator's *shape* (profile broadcast + batch scoring) is the
# real deliverable; swap profiles for fastText-style models on a
# cluster.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", " th", "of "),
    "fr": ("le ", "la ", "et ", "les", "de "),
    "es": ("el ", "los", "que", "de ", "ión"),
    "de": ("der", "die", "und", "ein", "sch"),
    "zh": ("的", "是", "了", "在", "我"),
}


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (non-space runs; counted via the
    replace-length trick — no split array, no per-match strings, no
    interpreted HOF)."""
    return _count_matches(text, r"\S+")


def token_count_bpe(text: Column) -> Column:
    """BPE-ish subword count: word-pieces + digits + punctuation runs
    (GPT-2-style pre-tokenizer regex, simplified)."""
    return _count_matches(text, r"[a-zA-Z]{1,4}|[0-9]+|[^a-zA-Z0-9\s]")


# Codegen note (SURVEY.md §4.3, NOTES.md): higher-order lambdas
# (filter/size-over-filter/aggregate) are CodegenFallback —
# interpreted. The token stats below are re-expressed with
# regexp_extract_all / regexp_replace, which ARE whole-stage-codegen
# expressions, with EXACTLY the same values:
#   * token            = maximal [a-z0-9']+ run of lower(text), so
#     n_words == count of regex matches;
#   * stopword         = token string-equal to a STOPWORDS entry, so
#     n_stop == matches of (?<![a-z0-9'])(the|...)(?![a-z0-9']);
#   * sum of token lens == count of [a-z0-9'] chars in lower(text).
# Oracle-checked (q_doc_quality) before and after the rewrite.
_WORD_RE = r"[a-z0-9']+"
_STOP_RE = r"(?<![a-z0-9'])(" + "|".join(STOPWORDS) + r")(?![a-z0-9'])"


def _count_matches(s: Column, pat: str) -> Column:
    """Count non-overlapping matches of ``pat`` WITHOUT materializing
    them. Spark's regexp_count is RuntimeReplaceable to
    size(regexp_extract_all(...)) — it builds a per-match string
    array just to count, measured ~25s per 100k 5 KB docs for the
    word pattern, while a regexp_replace pass appends to one
    StringBuilder and runs ~1s (NOTES r05 diag). r06: ONE replace
    pass instead of two — ``x$0`` re-emits each match with one extra
    char, so length(replaced) - length(s) IS the match count; for the
    stopword alternation (the most expensive pattern in the quality
    family) the second full-text scan was ~40% of the whole query's
    single-core cost (guide §1.2 per-task work; measured in
    OPTIMIZATION_r06.md). Requires a pattern that cannot match the
    empty string (all of ours)."""
    return F.length(F.regexp_replace(s, pat, r"x$0")) - F.length(s)


def _n_words(lowered: Column) -> Column:
    return _count_matches(lowered, _WORD_RE)


def _n_stop(lowered: Column) -> Column:
    # one alternation pattern (measured 2.6x faster than 25 separate
    # per-stopword passes — the lookbehind defeats literal prefix
    # optimization, so splitting multiplies full-text scans)
    return _count_matches(lowered, _STOP_RE)


def _quality_base(text: Column) -> dict[str, Column]:
    """The five base counts (chars, words, stopwords, punctuation
    chars, word-char mass) — THE single source of the formulas; every
    public quality API derives from this dict. Perf notes baked in
    (NOTES r05 forensics, all value-identical):
      * match COUNTS via the replace-length trick, never
        size(regexp_extract_all) (which Spark's regexp_count rewrites
        to) — no per-match string array;
      * sum_word_len strips word RUNS and subtracts (regexp_replace
        cost tracks the RETAINED bytes: keep-the-bulk measured
        20-35x slower than strip-the-bulk for the same value).
    """
    lowered = F.lower(text)
    # _qw stays the two-pass diff form (NOT _count_matches' one-pass
    # x$0): its strip-all pass is byte-shared with _qwl below, so the
    # pair costs two regex passes either way, and the x$0 pass (which
    # rebuilds len+n chars) is ~60% dearer than the replace-with-x
    # pass (measured r06). _qs has no such sharing — the one-pass form
    # halves the stopword-alternation scans, the family's hottest.
    return {
        "_qc": F.length(text),
        "_qw": F.length(F.regexp_replace(lowered, _WORD_RE, "x"))
        - F.length(F.regexp_replace(lowered, _WORD_RE, "")),
        "_qs": _n_stop(lowered),
        "_qp": F.length(
            F.regexp_replace(text, r"[^\.,;:!\?'\"\-]", "")
        ),
        "_qwl": F.length(lowered)
        - F.length(F.regexp_replace(lowered, r"[a-z0-9']+", "")),
    }


def _quality_feature_exprs(c: dict[str, Column]) -> list[Column]:
    n_chars, n_words = c["_qc"], c["_qw"]
    n_stop, n_punct, sum_wl = c["_qs"], c["_qp"], c["_qwl"]
    mean_word_len = F.when(
        n_words > 0, F.round(sum_wl / n_words, 4)
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, F.round(n_stop / n_words, 4)).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(
        n_chars > 0, F.round(n_punct / n_chars, 4)
    ).otherwise(F.lit(0.0))
    return [
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_word_len.alias("mean_word_len"),
    ]


def _quality_score_expr(c: dict[str, Column]) -> Column:
    # NULL text must score like EMPTY text (0.3333), not 0.6667:
    # least() skips a null len_term, silently ranking decode-failure
    # rows above real low-quality pages and letting garbage hosts
    # evade the mined blocklist (review r05)
    n_chars, n_words, n_stop, n_punct = (
        F.coalesce(c["_qc"], F.lit(0)),
        F.coalesce(c["_qw"], F.lit(0)),
        F.coalesce(c["_qs"], F.lit(0)),
        F.coalesce(c["_qp"], F.lit(0)),
    )
    len_term = F.least(n_words.cast("double") / 100.0, F.lit(1.0))
    stop_term = F.least(
        (F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))) * 5.0,
        F.lit(1.0),
    )
    punct_term = F.lit(1.0) - F.least(
        F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)) * 5.0,
        F.lit(1.0),
    )
    return F.round((len_term + stop_term + punct_term) / 3.0, 4)


def _bound_refs() -> dict[str, Column]:
    # built lazily: F.col needs an active SparkContext, so this must
    # not run at import time
    return {k: F.col(k) for k in ("_qc", "_qw", "_qs", "_qp", "_qwl")}


def quality_bound_cols(text: Column) -> list[Column]:
    """The base counts as bound columns (``_qc/_qw/_qs/_qp/_qwl``),
    each computed EXACTLY ONCE — project these first, then read them
    with quality_feature_cols()/quality_score_col(). Embedding the
    counts inline repeats every regex pass per referencing expression
    (the quality family measured 150-220s per 100k 5 KB docs inline
    vs ~15s staged; Catalyst does not re-merge the duplicates)."""
    return [c.alias(n) for n, c in _quality_base(text).items()]


def quality_feature_cols() -> list[Column]:
    """Feature columns over the bound ``_q*`` counts."""
    return _quality_feature_exprs(_bound_refs())


def quality_score_col() -> Column:
    """[0,1] heuristic quality score over the bound ``_q*`` counts."""
    return _quality_score_expr(_bound_refs())


def with_quality(
    docs: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """docs + a quality column, staged so every base count runs once
    (the fast path curate's scoring uses)."""
    return docs.select(
        "*", *quality_bound_cols(F.col(text_col))
    ).select(*docs.columns, quality_score_col().alias(out_col))


def quality_features(text: Column) -> list[Column]:
    """Length / punctuation / stopword-ratio quality features —
    INLINE compat form (same formulas by construction: derives from
    _quality_base like the staged API). Each referenced count
    re-evaluates per expression here; prefer the staged form in hot
    paths."""
    return _quality_feature_exprs(_quality_base(text))


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality score — inline compat form (see
    quality_features)."""
    return _quality_score_expr(_quality_base(text))


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint.

    fp = (Σ_i hex16(md5(word_i)[:4]) * i) mod (2^31 - 1), i 1-based —
    chosen (over xxhash64) because md5 exists in both Spark and DuckDB,
    making the operator oracle-checkable end-to-end (4 hex chars keep
    the DuckDB mirror's hex-parse lambda small).
    """
    words = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit(""))
    m = F.lit(2147483647).cast("long")
    # word-less/null text fingerprints as 0, NOT null: the sequence
    # pad fed zip_with a null word whose md5 poisoned the whole
    # aggregate, lumping every empty doc into the null join key
    # (review r05)
    return F.when(
        F.size(words) <= 0, F.lit(0).cast("long")
    ).otherwise(F.aggregate(
        F.zip_with(
            words,
            F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1))),
            lambda w, i: F.pmod(
                F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long") * i.cast("long"), m
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: F.pmod(acc + v, m),
    ))


_LANG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
    ]
)


def _lang_id_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-row loop INSIDE the Arrow batch — measured fastest, not an
    oversight. ``str.count`` is CPython's two-way C substring search;
    alternatives benchmarked on this box (100k short docs / 20k 2KB-word
    docs, 25 markers): pandas ``Series.str.count`` (regex engine) 0.6x/
    1.0x, ``np.char.count`` 0.4x (fixed-width U-dtype conversion),
    pyarrow ``count_substring`` 3x faster on short docs but 0.4x on the
    long-doc tail that dominates wall-clock. The loop is batch-granular
    (one JVM→Python Arrow crossing), which is the sanctioned shape for
    parser-class work."""
    markers = {lang: tuple(ms) for lang, ms in LANG_MARKERS.items()}
    for pdf in batches:
        preds, confs = [], []
        for text in pdf["text"]:
            s = (text or "").lower()
            scores = {
                lang: sum(s.count(m) for m in ms) for lang, ms in markers.items()
            }
            total = sum(scores.values())
            # deterministic argmax: score desc, lang name asc
            best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            preds.append(best[0] if total else "und")
            confs.append(round(best[1] / total, 4) if total else 0.0)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang_pred": preds, "lang_conf": confs}
        )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character-n-gram language ID (Arrow-batched; rows-only oracle)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(_lang_id_batches, schema=_LANG_SCHEMA)


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hot: int = 1024,
) -> DataFrame:
    """Corpus-typicality score: per-doc mean log10 probability under
    the corpus's own unigram LM (the classic perplexity-proxy quality
    filter — CCNet/RefinedWeb-style, with the corpus itself as the LM
    so the operator is closed over its input and fully oracle-able).
    Low scores = gibberish/rare-token soup; unusually high = boilerplate.

    Returns (doc_id, n_tokens, avg_logprob) with avg_logprob rounded
    to 6 places.

    Plan (two passes over the token multiset, both shuffle-bounded by
    DISTINCT keys, not token occurrences):

      1. per-doc term frequencies: groupBy(doc_id, word) — map-side
         combine collapses within-doc repeats before the exchange;
      2. global counts: groupBy(word) over the tf rows;
      3. tf ⋈ counts on word. The word distribution is zipfian — the
         top handful of stopwords appear in EVERY doc, which is
         textbook join skew at 10^12 rows. Handled explicitly with a
         hot/cold split: the ``n_hot`` most frequent words are
         broadcast (a KB-scale map handling the overwhelmingly hot
         keys with ZERO shuffle), the zipf tail — whose keys are
         near-uniform by construction — takes the ordinary shuffle
         join. Output = identical to a single join (each tf row
         matches exactly one side); AQE skew splitting stays on as
         the second line of defense.

    The corpus token total rides in as a literal via one driver-side
    scalar collect (a single row — not a data collect)."""
    words = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("word"),
    )
    # lazy pins: tf feeds BOTH union branches and counts feeds the
    # total collect + hot + cold — Spark has no common-subplan reuse,
    # so unmaterialized this plan re-tokenized the corpus ~5x per call
    # (review r05; the stupid_backoff/dsir_weights idiom)
    tf = (
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    counts = (
        tf.groupBy("word")
        .agg(F.sum("k").alias("c"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("c")).collect()[0][0] or 0
    hot = counts.orderBy(F.desc("c"), "word").limit(n_hot)
    cold = counts.join(F.broadcast(hot.select("word")), "word", "left_anti")
    logp = F.log10(F.col("c") / F.lit(float(total)))
    scored = tf.join(F.broadcast(hot), "word").unionByName(
        tf.join(cold, "word")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.round(F.sum(F.col("k") * logp) / F.sum("k"), 6).alias("avg_logprob"),
        )
    )


def compression_ratio(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """(doc_id, n_bytes, compression_ratio) — zlib compressed/raw size
    per document: the RefinedWeb/MassiveWeb-family "too compressible"
    quality signal (boilerplate/repetition compresses far below
    natural prose; random gibberish barely compresses at all — filter
    BOTH tails).

    Arrow-batched pandas UDF, zlib (stdlib C) per doc — the per-row
    loop is the same deliberate trade as lang_id (the work inside is
    C). Deterministic for a fixed zlib version + level (pinned
    explicitly); ratios rounded JVM-side. Rows-only (DuckDB has no
    zlib); monotonicity gates in tests/test_trainingdata_ops.py.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(text: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in text:
            b = (t or "").encode("utf-8")
            out.append(len(zlib.compress(b, level)) / len(b) if b else 1.0)
        return pd.Series(out)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(text_col).alias("n_bytes"),
        F.round(_ratio(F.col(text_col)), 6).alias("compression_ratio"),
    )


def ccnet_buckets(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style per-language perplexity terciles (Wenzek et al.
    2020 §4.3): within each language, rank documents by LM typicality
    (higher score = lower perplexity = more Wikipedia-like) and cut
    into head / middle / tail thirds — the standard keep-head(-and-
    middle) quality gate of CCNet/CC-100/LLaMA data prep.

    EXACT form: percent_rank over (lang) ordered by (score DESC, id)
    — the id tiebreak makes ranks unique, so pr and bucket are fully
    deterministic and oracle-checkable. Returns (doc_id, lang, score,
    pr, bucket).

    Scale note — this exact form is the SMALL-corpus/oracle path: the
    window partitions by LANGUAGE, a handful of giant keys at 10^12
    rows (all-English-in-one-sort is textbook key skew). The
    production path is ``ccnet_bucket_by_thresholds``: per-lang
    approximate quantile cutoffs (a KB-scale aggregate) broadcast
    back as a pure scan predicate — zero wide shuffles, at the price
    of approx boundaries (agreement gate in tests/test_ccnet.py).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(lang_col).orderBy(
        F.desc(score_col), F.col(id_col)
    )
    pr = F.percent_rank().over(w)
    return scored.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.col(score_col).alias("score"),
        F.round(pr, 6).alias("pr"),
        F.when(pr < 1.0 / 3, F.lit("head"))
        .when(pr < 2.0 / 3, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def ccnet_bucket_thresholds(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    lang_col: str = "lang",
    accuracy: int = 10000,
) -> DataFrame:
    """Per-language bucket cutoffs for the scan-side CCNet path:
    (lang, t_head, t_middle) where t_head/t_middle are the ascending
    2/3 and 1/3 approx quantiles of the score. ONE map-side-combined
    aggregate whose state is a bounded quantile sketch per language —
    rows out = number of languages, broadcastable by construction."""
    q = F.percentile_approx(score_col, [2.0 / 3, 1.0 / 3], accuracy)
    return scored.groupBy(F.col(lang_col).alias("lang")).agg(
        q.getItem(0).alias("t_head"), q.getItem(1).alias("t_middle")
    )


def ccnet_bucket_by_thresholds(
    scored: DataFrame,
    thresholds: DataFrame,
    score_col: str = "avg_logprob",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """The 10^12-row CCNet bucket assignment: broadcast-join the
    per-lang cutoff table (languages × 2 doubles) and bucket with a
    pure predicate — no window, no per-lang sort, no skew (the only
    exchange anywhere is inside the threshold aggregate's sketch
    merge). Ties AT a cutoff go to the better bucket (>=), so a
    constant-score language lands entirely in head — the conservative
    keep-more choice."""
    j = scored.join(F.broadcast(thresholds), on=lang_col, how="left")
    s = F.col(score_col)
    return j.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        s.alias("score"),
        F.when(s >= F.col("t_head"), F.lit("head"))
        .when(s >= F.col("t_middle"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# Unicode scripts the detector distinguishes, in deterministic
# tiebreak priority order (earlier wins on equal counts). Values are
# Java-regex script classes (\p{IsXxx}); the DuckDB oracle uses the
# RE2 spellings (\p{Xxx}) of the SAME Unicode script properties, so
# both engines count identical code-point sets.
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", r"\p{IsLatin}"),
    ("cyrillic", r"\p{IsCyrillic}"),
    ("greek", r"\p{IsGreek}"),
    ("arabic", r"\p{IsArabic}"),
    ("hebrew", r"\p{IsHebrew}"),
    ("devanagari", r"\p{IsDevanagari}"),
    ("han", r"\p{IsHan}"),
    ("hiragana", r"\p{IsHiragana}"),
    ("katakana", r"\p{IsKatakana}"),
    ("hangul", r"\p{IsHangul}"),
)


def script_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode script identification (the writing-system sibling of
    lang_id — CLD/fastText pipelines gate on script before language:
    a 'zh'-labeled page full of Latin code points is mislabeled or
    boilerplate). Per document: the code-point count of each script
    in SCRIPT_CLASSES plus ``dominant_script`` (argmax, ties broken
    by the fixed priority order above; all-zero → 'none' — e.g. pure
    digits/punctuation, which belong to Common, not a script).

    Counts are code points, not bytes: Spark ``length`` and DuckDB
    ``length`` both count code points, so the oracle comparison is
    exact even for astral-plane text.

    Scale shape: pure whole-stage-codegen string expressions — one
    regexp_replace + two lengths per script — ZERO shuffles, ZERO
    Python. At 10 scripts that is 10 regex passes per page; a fused
    single-pass counter would need a UDF and lose codegen — the
    regex passes are JVM-side and stream, the UDF would not.
    """
    out = docs.select(
        F.col(id_col), F.col(text_col), *script_count_cols(F.col(text_col))
    )
    return out.select(
        id_col,
        *[f"n_{name}" for name, _ in SCRIPT_CLASSES],
        dominant_script_col().alias("dominant_script"),
    )


def script_count_cols(text: Column) -> list[Column]:
    """Per-script code-point count columns (``n_<script>``) — shared
    by script_counts and annotate.annotate's one-scan pass."""
    return [
        (
            F.length(text) - F.length(F.regexp_replace(text, pat + "+", ""))
        ).alias(f"n_{name}")
        for name, pat in SCRIPT_CLASSES
    ]


def dominant_script_col() -> Column:
    """Argmax over the bound ``n_<script>`` columns (ties break by the
    SCRIPT_CLASSES priority order; all-zero → 'none')."""
    m = F.greatest(*[F.col(f"n_{name}") for name, _ in SCRIPT_CLASSES])
    dominant = F.when(m == 0, F.lit("none"))
    for name, _ in SCRIPT_CLASSES:
        dominant = dominant.when(F.col(f"n_{name}") == m, F.lit(name))
    return dominant


# ------------------------------------------------- sentence segmentation

# One run per sentence: anything up to a terminator run (ASCII .!? plus
# CJK 。！？), requiring at least one non-space non-terminator char so
# bare punctuation ('...') yields nothing; a final unterminated tail is
# its own sentence. Java-regex ∩ RE2 subset (no lookaround) so the
# DuckDB oracle runs the IDENTICAL pattern. Applied to
# whitespace-NORMALIZED text only — Java '$' matches before a final
# newline while RE2's does not, so normalization (which strips the
# trailing newline case entirely) is what keeps the two engines
# byte-identical. The normalization class INCLUDES \x0B (vertical
# tab): Java \s covers it, RE2 \s does not, so \x0B must be gone from
# the text before the pattern's \s runs — review r05 found the
# divergence live ('\x0b.' → 0 sentences in Spark, 1 in DuckDB).
_WS_CLASS = "[ \t\r\n\f\x0b]"
# \s* before the terminator run: typographically-spaced text
# ('bonjour !') previously matched NEITHER alternative and the
# whole clause vanished from sentence_rows/readability (review
# r05) — not mis-split, LOST.
_SENT_RE = (
    "[^.!?。！？]*[^.!?。！？\\s]\\s*[.!?。！？]+"
    "|[^.!?。！？]*[^.!?。！？\\s]$"
)


# r06: zero-width boundary split replacing regexp_extract_all on
# _SENT_RE. Java's backtracking engine is pathological on the
# extraction form over terminator-FREE text (the common case for
# word-salad / list-like pages): the first alternative re-scans from
# every start position, measured ~106 us per 300-char doc and a
# >6-minute hang for the alternative alone at sf1.0, vs 0.375 s for
# the whole corpus with the split form (guide §1.2 per-task work;
# OPTIMIZATION_r06.md has the A/B). Equivalence: _SENT_RE matches
# are exactly (run of non-terminators containing a non-space) +
# (terminator run), plus a trailing non-space-ending fragment; the
# boundary split cuts after every terminator run, so each piece is
# [^T]*[T]+ (or the trailing [^T]*), and a piece yields a match iff
# it contains a char outside terminators+whitespace — which is the
# rlike filter below. Verified old==new on all four SF corpora and a
# 23-case adversarial fixture (CJK terminators, runs, empties,
# typographic spacing, \x0b, null).
_TERM_CLASS = ".!?。！？"
_SENT_BOUNDARY_RE = f"(?<=[{_TERM_CLASS}])(?![{_TERM_CLASS}])"
# post-normalization the only whitespace is a plain space
_SENT_CONTENT_RE = "[^\\.!\\?。！？ ]"


def sentence_split(text: Column) -> Column:
    """array<string> of trimmed sentences (documented naive subset: a
    terminator always ends a sentence, so 'Dr. Smith' splits — the
    corpus-stats convention, not a linguistic segmenter; CCNet-style
    dedup/alignment work at this granularity)."""
    # explicit class, not \s: Java \s includes \x0B, RE2's does not
    norm = F.trim(F.regexp_replace(text, _WS_CLASS + "+", " "))
    # explicit 1-arg lambda: transform would otherwise feed the array
    # index into F.trim's optional trimStr parameter
    return F.filter(
        F.transform(F.split(norm, _SENT_BOUNDARY_RE), lambda s: F.trim(s)),
        lambda s: (s != F.lit("")) & s.rlike(_SENT_CONTENT_RE),
    )


def sentence_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sent_idx, sentence, n_words) — one row per sentence in
    document order. One narrow codegen scan + posexplode, zero
    shuffles, zero Python; feeds sentence-level dedup (line_dedup on
    the sentence column) and alignment candidates."""
    return docs.select(
        F.col(id_col), F.posexplode(sentence_split(F.col(text_col)))
    ).select(
        F.col(id_col),
        F.col("pos").cast("int").alias("sent_idx"),
        F.col("col").alias("sentence"),
        # post-normalization a single space is the only separator
        F.size(F.split(F.col("col"), " ")).cast("int").alias("n_words"),
    )


def readability_cols(text: Column) -> list[Column]:
    """Flesch Reading Ease + Flesch-Kincaid grade as pure codegen
    columns (n_words, n_sentences, n_syllables, flesch, fk_grade) —
    the classic shallow quality/complexity annotation next to
    doc_quality's ratio features. Documented heuristic: syllables =
    vowel-group runs ([aeiouy]+) over the lowercased text (spaces
    break runs, so the whole-text count equals the per-word sum;
    vowel-less tokens contribute 0), sentences = the sentence_split
    pattern's match count, denominators floored at 1. Every
    expression is in the Java-regex ∩ RE2 subset so the DuckDB
    oracle runs the IDENTICAL arithmetic."""
    # counts via the replace-length trick (module convention — never
    # size(regexp_extract_all), which builds a per-match string array)
    norm = F.trim(F.regexp_replace(text, _WS_CLASS + "+", " "))
    n_words = _count_matches(norm, "[^ ]+").cast("int")
    # r06: count via the linear boundary-split form (see
    # sentence_split above) — _SENT_RE through the backtracking
    # engine is the same pathological scan whether replacing or
    # extracting; size-of-filtered-pieces is the identical count
    n_sents = F.size(
        F.filter(
            F.split(norm, _SENT_BOUNDARY_RE),
            lambda s: s.rlike(_SENT_CONTENT_RE),
        )
    ).cast("int")
    n_syll = _count_matches(F.lower(norm), "[aeiouy]+").cast("int")
    wps = n_words.cast("double") / F.greatest(n_sents, F.lit(1)).cast("double")
    spw = n_syll.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    return [
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "flesch"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4).alias(
            "fk_grade"
        ),
    ]
