"""Content-vs-boilerplate block classification rules (pure-Python spec).

Web-text analog of nidaba's recognition phase (reference:
nidaba/tasks/ocr.py — SURVEY.md §2A A11): where nidaba turns segmented
zones into text via an OCR engine, we decide per DOM block whether it
is main content. The decision procedure is the published boilerpipe
``NumWordsRulesClassifier`` (Kohlschütter, Fankhauser, Nejdl: WSDM 2010
"Boilerplate Detection using Shallow Text Features"), a decision-tree
over the current/previous/next block's word counts and link densities:

    if curr.link_density > 1/3:                    boilerplate
    elif prev.link_density <= 0.555556:
        content iff curr.n_words > 16 or next.n_words > 15
                    or prev.n_words > 4
    else:
        content iff curr.n_words > 40 or next.n_words > 17

Missing neighbors (first/last block) contribute n_words=0,
link_density=0.  A deterministic score in [0,1] is attached for
ranking/debugging; the boolean decision alone drives extraction.

This module is the SPEC: the golden oracle runs it as-is (per block,
single-threaded). The Spark pipeline re-implements the identical
decision tree as JVM Column expressions over the blocks array
(operators/classify.py) — the equivalence of the two implementations
is exactly what the golden end-to-end test pins down.
"""

from __future__ import annotations

MAX_LINK_DENSITY_CURR = 0.333333
MAX_LINK_DENSITY_PREV = 0.555556
MIN_WORDS_CURR = 16
MIN_WORDS_NEXT = 15
MIN_WORDS_PREV = 4
MIN_WORDS_CURR_HIGHLINK = 40
MIN_WORDS_NEXT_HIGHLINK = 17


def classify_block(
    curr_words: int,
    curr_link_density: float,
    prev_words: int,
    prev_link_density: float,
    next_words: int,
) -> bool:
    """NumWordsRules decision for one block. True = main content."""
    if curr_link_density > MAX_LINK_DENSITY_CURR:
        return False
    if prev_link_density <= MAX_LINK_DENSITY_PREV:
        return (
            curr_words > MIN_WORDS_CURR
            or next_words > MIN_WORDS_NEXT
            or prev_words > MIN_WORDS_PREV
        )
    return curr_words > MIN_WORDS_CURR_HIGHLINK or next_words > MIN_WORDS_NEXT_HIGHLINK


def block_score(curr_words: int, curr_link_density: float) -> float:
    """Deterministic [0,1] confidence-ish score (monotone in words,
    antitone in link density); informational only."""
    w = min(curr_words, 100) / 100.0
    return round(w * (1.0 - min(1.0, curr_link_density)), 6)
