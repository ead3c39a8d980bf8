"""Soft URL quality scoring (RefinedWeb-style URL filtering, part 2).

``hoststats.filter_blocked`` is the HARD side of URL filtering — an
explicit host blocklist plus path regexes. This module is the SOFT
side from the RefinedWeb / C4 lineage: per-URL lexical features
(length, digit density, parameter junk, percent-encoding, IP-literal
hosts, hyphen-stuffed domains) plus a weighted keyword score over the
URL string itself, combined into one ``url_score`` a curation pass can
threshold.  Penalized-word matching is deliberately SUBSTRING matching
on the lowercased URL (RefinedWeb's sub-word convention): URLs glue
words together (``freexxxmovies``), so word boundaries would miss the
bulk of real hits; the cost is benign collisions (``sussex``,
``essex`` hit ``sex`` at weight 0.25), which is why no single soft
word is disqualifying — only the aggregate score is.

Scale shape: every feature is a whole-stage-codegen string expression
over the url column — zero shuffles, zero Python, runs inside the
scan projection.  At 10^12 rows this adds no stage to whatever plan
consumes it; ``url_quality_filter`` is a pure scan predicate that
Parquet/Iceberg evaluates after pushdown of any upstream filters.

Every expression is in the Java-regex ∩ RE2 subset so the DuckDB
oracle (plans/trainingdata.q_url_quality) runs the IDENTICAL logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hoststats import canonical_host

# (substring, weight): matched against the LOWERCASED full url.
# Weights follow the RefinedWeb convention of strict words ~1.0 and
# ambiguous fragments well below the default drop threshold.  Kept
# deliberately small and published in-code: the list is corpus policy,
# not secret sauce — production swaps in its own list via soft_words=.
DEFAULT_SOFT_WORDS: tuple[tuple[str, float], ...] = (
    ("porn", 1.0),
    ("xxx", 1.0),
    ("escort", 1.0),
    ("viagra", 1.0),
    ("casino", 0.8),
    ("erotic", 0.8),
    ("gambl", 0.6),  # stem: gamble/gambling/gambler
    ("poker", 0.6),
    ("lingerie", 0.5),
    ("webcam", 0.4),
    ("torrent", 0.4),
    ("adult", 0.4),
    ("dating", 0.3),
    ("sex", 0.25),  # substring-collides (essex/sussex): low weight
)

# path = everything after scheme/authority up to '?' or '#'
_PATH_RE = r"^(?:[a-z][a-z0-9+.-]*:)?(?://)?(?:[^@/?#]*@)?[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_IP_HOST_RE = r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$"


def _count_chars(s: Column, char_class: str) -> Column:
    """Occurrences of a single-char class, via the replace-length
    trick (textstats._count_matches rationale: one StringBuilder pass,
    never a per-match array)."""
    return F.length(s) - F.length(F.regexp_replace(s, char_class, ""))


def _features(
    url: Column,
    soft_words: tuple[tuple[str, float], ...],
) -> dict[str, Column]:
    """Name -> unaliased feature expression (see url_feature_cols).

    A NULL url is treated as NO information, not maximum junk: every
    feature coalesces to its empty-string value (all zeros, score 0.0)
    so ``url_quality_filter`` passes such rows — consistent with the
    hard side (hoststats.filter_blocked's anti-join passes NULL urls).
    Without the coalesce, Spark's null-skipping least() would saturate
    four capped components to their caps and score a missing url 1.3.
    """
    url = F.coalesce(url, F.lit(""))
    u = F.lower(F.trim(url))
    host = canonical_host(url)
    hlen = F.greatest(F.length(host), F.lit(1))
    host_digit_frac = F.round(
        _count_chars(host, "[0-9]").cast("double") / hlen.cast("double"), 4
    )
    host_hyphens = _count_chars(host, "-").cast("int")
    path = F.regexp_extract(u, _PATH_RE, 1)
    path_depth = _count_chars(path, "/").cast("int")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    n_params = (
        F.when(query == "", F.lit(0))
        .otherwise(_count_chars(query, "&") + 1)
        .cast("int")
    )
    # %-escapes: replace-length shrinks 3 chars -> 1 per match, so the
    # length delta is 2x the match count
    pct_encoded = (
        (
            F.length(u)
            - F.length(F.regexp_replace(u, "%[0-9a-f]{2}", "x"))
        )
        / 2
    ).cast("int")
    is_ip_host = host.rlike(_IP_HOST_RE)
    # seed with 0.0 so soft_words=() yields a 0.0 score instead of a
    # TypeError from F.round(None, 4)
    soft = F.lit(0.0)
    for w, wt in soft_words:
        soft = soft + F.when(u.contains(w), F.lit(float(wt))).otherwise(
            F.lit(0.0)
        )
    soft_word_score = F.round(soft, 4)
    url_len = F.length(u).cast("int")
    score = F.round(
        F.least(soft_word_score, F.lit(1.0)) * 1.0
        + F.when(is_ip_host, F.lit(1.0)).otherwise(F.lit(0.0)) * 0.5
        + F.least(host_digit_frac * 3.0, F.lit(1.0)) * 0.5
        + F.least(host_hyphens.cast("double") / 4.0, F.lit(1.0)) * 0.3
        + F.least(n_params.cast("double") / 6.0, F.lit(1.0)) * 0.3
        + F.least(pct_encoded.cast("double") / 5.0, F.lit(1.0)) * 0.2
        + F.when(url_len > 200, F.lit(0.2)).otherwise(F.lit(0.0)),
        4,
    )
    return {
        "url_len": url_len,
        "host": host,
        "host_digit_frac": host_digit_frac,
        "host_hyphens": host_hyphens,
        "path_depth": path_depth,
        "n_params": n_params,
        "pct_encoded": pct_encoded,
        "is_ip_host": is_ip_host,
        "soft_word_score": soft_word_score,
        "url_score": score,
    }


def url_feature_cols(
    url: Column,
    soft_words: tuple[tuple[str, float], ...] = DEFAULT_SOFT_WORDS,
) -> list[Column]:
    """Codegen feature columns for one url expression.

    Emits: url_len, host, host_digit_frac, host_hyphens, path_depth,
    n_params, pct_encoded, is_ip_host, soft_word_score, url_score.
    ``url_score`` is a bounded heuristic (higher = junkier): each
    component is capped at 1 before weighting so no single feature
    saturates the score, mirroring doc_quality's clamp convention.
    """
    return [
        c.alias(name) for name, c in _features(url, soft_words).items()
    ]


def url_quality(
    pages: DataFrame,
    url_col: str = "url",
    soft_words: tuple[tuple[str, float], ...] = DEFAULT_SOFT_WORDS,
) -> DataFrame:
    """Per-page URL feature table: (url_col, url_len .. url_score).
    One narrow codegen projection; zero shuffles."""
    return pages.select(
        F.col(url_col), *url_feature_cols(F.col(url_col), soft_words)
    )


def url_quality_filter(
    pages: DataFrame,
    max_score: float = 1.0,
    url_col: str = "url",
    soft_words: tuple[tuple[str, float], ...] = DEFAULT_SOFT_WORDS,
) -> DataFrame:
    """Drop pages whose composite url_score reaches ``max_score``.
    A pure scan predicate over the original columns — composes with
    hoststats.filter_blocked (hard blocklist) ahead of extraction so
    rejected pages never reach the HTML parse."""
    score = _features(F.col(url_col), soft_words)["url_score"]
    return pages.filter(score < max_score)
