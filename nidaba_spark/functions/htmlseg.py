"""DOM → block segmentation on stdlib ``html.parser``.

Web-text analog of nidaba's page-segmentation phase (reference:
nidaba/tasks/segmentation.py + nidaba/plugins/kraken.py `segmentation`,
SURVEY.md §2A A6–A10): where nidaba cuts a page image into zones/lines,
we cut an HTML DOM into text blocks at block-level tag boundaries and
attach the per-block features the downstream boilerplate classifier
(SURVEY.md §2A A11, boilerpipe-style) consumes.

Backend seam: nidaba loads OCR engines through a plugin registry
(nidaba/plugins/__init__.py `setup()` hooks). Our equivalent seam is
this module's ``segment_html`` free function — an lxml-backed drop-in
can be slotted in on a real cluster as long as it emits identical
blocks (the contract below), which tests enforce for the stdlib
backend. stdlib ``html.parser`` is used here because the sandbox has
no lxml and it is tolerant of tag soup while remaining
order-deterministic.

Block contract (fully specifies "what a block is"):
  * Text accumulates into the current block; a block is flushed when a
    block-level tag opens or closes, or at end of document.
  * ``<script>/<style>/<template>`` content and comments/CDATA/decls
    are ignored entirely.
  * Entity references are resolved (convert_charrefs=True).
  * Features per block (before normalization):
      tag          nearest enclosing block-level tag at flush time
      depth        open-element stack depth at flush time
      text         normalized text (textnorm.normalize_text)
      n_chars      len(text) after normalization
      n_words      text.split() token count
      n_anchor_chars / n_anchor_words   portion inside <a> elements
      n_tags       inline tags opened while the block accumulated
      link_density n_anchor_chars / max(n_chars, 1)
      text_density n_words / ceil(n_chars / 80)  (words per 80-char
                   "line", the boilerpipe wrap-width convention)
  * Empty blocks (no text after normalization) are dropped.
  * block_id = 0..n-1 in document order.

Everything is pure and deterministic: same bytes → same block list on
any executor, any partitioning.
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass
from html.parser import HTMLParser

from .textnorm import normalize_text, normalize_words

# The fast tokenizer mirrors CPython 3.10-3.12's html/parser.py branch
# for branch (htmltok.py docstring); 3.13 changed set_cdata_mode and
# the tolerant parsing paths, so outside the verified range the
# "event-equivalent to stdlib" contract of backend='fast' no longer
# holds — fall back to the stdlib backend rather than silently
# diverging (ADVICE r02). The differential fuzz suite
# (tests/test_htmltok.py) is what certifies a new interpreter version.
_FAST_BACKEND_OK = (3, 10) <= sys.version_info[:2] <= (3, 12)

BLOCK_TAGS = frozenset(
    """p div li h1 h2 h3 h4 h5 h6 td th tr ul ol table article section
    pre blockquote header footer nav aside main body html form fieldset
    dl dt dd figure figcaption address hr br""".split()
)

SKIP_CONTENT_TAGS = frozenset({"script", "style", "template", "noscript"})

# Void elements never go on the open-element stack (no closing tag).
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


@dataclass
class Block:
    block_id: int
    tag: str
    depth: int
    text: str
    n_chars: int
    n_words: int
    n_anchor_chars: int
    n_anchor_words: int
    n_tags: int
    link_density: float
    text_density: float


class _Segmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        # O(1) twins of the stack the hot paths consult: open-tag
        # counts (endtag membership test) and the open BLOCK tags in
        # stack order (enclosing-block lookup in _flush). Both are
        # updated on every stack append/pop, so block_stack ==
        # [t for t in stack if t in BLOCK_TAGS] at all times.
        self.counts: dict[str, int] = {}
        self.block_stack: list[str] = []
        self.skip_depth = 0  # >0 while inside script/style/template
        self.anchor_depth = 0
        self.parts: list[str] = []  # text fragments of the current block
        self.anchor_parts: list[str] = []
        self.inline_tags = 0
        self.blocks: list[Block] = []

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if not self.parts:
            # most flushes are empty (every block tag boundary flushes);
            # skip the join/normalize and just reset — observably
            # identical (no text -> no block). list.clear() (not a new
            # []) so the hottest path in the whole engine allocates
            # nothing (profiled: ~137k flushes per 3k docs).
            if self.anchor_parts:
                self.anchor_parts.clear()
            self.inline_tags = 0
            return
        raw = "".join(self.parts)
        text, n_words = normalize_words(raw)
        if text:
            if self.anchor_parts:
                anchor_text, n_anchor_words = normalize_words("".join(self.anchor_parts))
            else:
                anchor_text, n_anchor_words = "", 0
            n_chars = len(text)
            n_anchor_chars = len(anchor_text)
            enclosing = self.block_stack[-1] if self.block_stack else "body"
            lines = max(1, math.ceil(n_chars / 80))
            self.blocks.append(
                Block(
                    block_id=len(self.blocks),
                    tag=enclosing,
                    depth=len(self.stack),
                    text=text,
                    n_chars=n_chars,
                    n_words=n_words,
                    n_anchor_chars=n_anchor_chars,
                    n_anchor_words=n_anchor_words,
                    n_tags=self.inline_tags,
                    link_density=min(1.0, n_anchor_chars / max(n_chars, 1)),
                    text_density=n_words / lines,
                )
            )
        self.parts.clear()
        if self.anchor_parts:
            self.anchor_parts.clear()
        self.inline_tags = 0

    # -- parser callbacks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_CONTENT_TAGS:
            self.skip_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag not in VOID_TAGS:
                self.stack.append(tag)
                self.block_stack.append(tag)
                self.counts[tag] = self.counts.get(tag, 0) + 1
            return
        if tag == "a":
            self.anchor_depth += 1
        if not self.skip_depth:
            self.inline_tags += 1
        if tag not in VOID_TAGS:
            self.stack.append(tag)
            self.counts[tag] = self.counts.get(tag, 0) + 1

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_CONTENT_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self.anchor_depth = max(0, self.anchor_depth - 1)
        # Pop up to the matching open tag (tolerates unclosed children).
        if self.counts.get(tag, 0):
            while self.stack:
                popped = self.stack.pop()
                self.counts[popped] -= 1
                if popped in BLOCK_TAGS:
                    self.block_stack.pop()
                if popped == "a" and tag != "a":
                    self.anchor_depth = max(0, self.anchor_depth - 1)
                if popped == tag:
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()
        elif not self.skip_depth and tag not in SKIP_CONTENT_TAGS:
            self.inline_tags += 1

    def handle_data(self, data: str) -> None:
        if self.skip_depth or not data:
            return
        self.parts.append(data)
        if self.anchor_depth:
            self.anchor_parts.append(data)

    def close(self) -> None:  # final flush at EOF
        super().close()
        self._flush()


def segment_html(body: str, backend: str = "fast") -> list[Block]:
    """Segment a decoded HTML string into feature-annotated blocks.

    backend='fast' (default) drives the same _Segmenter state machine
    from functions/htmltok.py — a tokenizer that is event-equivalent to
    stdlib html.parser(convert_charrefs=True) but skips the machinery
    the segmenter never uses (line tracking, attr-value unescaping,
    comment/pi/decl dispatch); measured ~2x doc throughput.
    backend='stdlib' keeps the reference path; the differential tests
    (tests/test_htmltok.py) pin the two to identical block lists over
    the corpus, adversarial fixtures, and hypothesis fuzz.
    """
    seg = _Segmenter()
    try:
        if backend == "fast" and _FAST_BACKEND_OK:
            from .htmltok import feed_events

            feed_events(body, seg)
            seg._flush()
        else:
            seg.feed(body)
            seg.close()
    except Exception:
        # Both backends raise only where html.parser does (e.g. unknown
        # marked-section keywords); never throw on arbitrary bytes
        # (hypothesis-tested): keep whatever was parsed.
        seg._flush()
    return seg.blocks
