"""Deterministic text normalization (web-text analog of nidaba's
``postprocessing.spell_check`` stage — reference: nidaba/tasks/
postprocessing.py + nidaba/algorithms/string.py, SURVEY.md §2A A13).

nidaba normalizes recognizer output against a lexicon; our byte-identity
goal demands something stricter and simpler: a pure, idempotent
canonicalization so the same logical content always serializes to the
same bytes regardless of partitioning or executor count.

Spec (the golden oracle and the Spark pipeline both call exactly this):
  1. Unicode NFC.
  2. Zero-width characters stripped (ZWSP/ZWNJ/ZWJ/BOM-in-text).
  3. All ASCII whitespace runs (space, \t, \r, \n, \v, \f) plus NBSP
     collapsed to a single space.
  4. Leading/trailing whitespace stripped.

Idempotence (norm(norm(x)) == norm(x)) is asserted by a hypothesis
property test (tests/test_textnorm.py).
"""

from __future__ import annotations

import re
import unicodedata

_ZERO_WIDTH = dict.fromkeys([0x200B, 0x200C, 0x200D, 0xFEFF])
_WS_RE = re.compile("[ \\t\\r\\n\\v\\f\\u00a0]+")


def normalize_text(s: str) -> str:
    """Canonicalize a block's text. Pure, deterministic, idempotent."""
    if not s:
        return ""
    # exact fast path: NFC, zero-width strip, and NBSP folding are all
    # identity on pure-ASCII text (str.isascii is O(n) in C — far
    # cheaper than unicodedata.normalize + translate)
    if s.isascii():
        # split()/join ≡ the regex collapse+strip on ASCII input
        # (str.split with no args splits on every ASCII whitespace
        # char) and runs ~3x faster in C
        return " ".join(s.split())
    s = unicodedata.normalize("NFC", s)
    s = s.translate(_ZERO_WIDTH)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def normalize_words(s: str) -> tuple[str, int]:
    """(normalize_text(s), word count of the result) with one split on
    the ASCII fast path instead of normalize-then-split-again — the
    segmenter's _flush calls this for every non-empty block."""
    if not s:
        return "", 0
    if s.isascii():
        toks = s.split()
        return " ".join(toks), len(toks)
    t = normalize_text(s)
    return t, len(t.split())
