"""Fast HTML tokenizer: event-for-event equivalent to stdlib
``html.parser.HTMLParser(convert_charrefs=True)`` for the event subset
the segmenter consumes (handle_starttag / handle_endtag /
handle_startendtag / handle_data), at a fraction of the cost.

Why it exists: profiling the extraction pipeline shows ~70% of
single-thread segmentation time inside html.parser's ``goahead`` /
``parse_starttag`` / ``parse_endtag`` / ``updatepos`` machinery —
per-event Python dispatch, line/column bookkeeping, attribute-value
unescaping and ``__starttag_text`` capture that the block segmenter
never uses. This module re-implements exactly the consumption rules of
CPython's html/parser.py (regexes copied verbatim; control flow
mirrored branch by branch, including the tolerant/bug-compat paths:
junk start tags re-emitted as raw data, ``</>`` swallowed, bogus
comments, marked sections raising AssertionError on unknown keywords,
CDATA content modes for <script>/<style>, and the end-of-input
recovery that re-emits unparseable tails as data) while skipping the
unused work.

Equivalence contract: for ANY input string, ``feed_events(s, h)``
produces the same handler-event sequence as
``HTMLParser(convert_charrefs=True).feed(s); .close()`` up to
data-event chunking (adjacent handle_data calls may split differently;
the concatenation is identical — the segmenter joins fragments, so
chunking is immaterial). Enforced by differential fuzz tests
(tests/test_htmltok.py) over the synthetic corpus, adversarial
fixtures, and hypothesis-generated inputs.

Interpreter pin: the mirrored internals are CPython 3.10-3.12's
(verified exhaustively on this box's 3.11.7); CPython 3.13 changed
set_cdata_mode and tolerant parsing, so htmlseg.segment_html guards
backend='fast' behind that version range and falls back to stdlib
outside it (ADVICE r02). To certify a new interpreter: run the
differential fuzz suite against its html.parser and widen the range.
"""

from __future__ import annotations

import re
from html import unescape

# --- regexes copied from CPython html/parser.py + _markupbase.py ---
_starttagopen = re.compile("<[a-zA-Z]")
_tagfind_tolerant = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_attrfind_tolerant = re.compile(
    r"((?<=[\'\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"(\'[^\']*\'|\"[^\"]*\"|(?![\'\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_locatestarttagend_tolerant = re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    re.VERBOSE,
)
_endendtag = re.compile(">")
_endtagfind = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_commentclose = re.compile(r"--\s*>")
_markedsectionclose = re.compile(r"]\s*]\s*>")
_msmarkedsectionclose = re.compile(r"]\s*>")
_declname = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")

_CDATA_ELEMS = ("script", "style")
_ALPHA_EQ_SLASH = frozenset("abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ")

# One-shot fast path for conventional tags. If this STRICT regex
# matches, the tag is well-formed enough that the tolerant
# html.parser pipeline (locatestarttagend + tagfind + attrfind loop +
# tail check) provably yields the same (tag, endpos, start/startend)
# -- names are plain ASCII, attr values contain no <>'"-confusables,
# and the tag closes with '>' or '/>'. Anything else (quoted '>',
# exotic name chars, junk) falls through to the mirrored slow path.
_FAST_START = re.compile(
    # NB: the bare-value class INCLUDES '/' — html.parser's tolerant
    # bare value is [^>\s]*, so in <a href=x/> the '/' belongs to the
    # VALUE and the tag is a plain start tag; greedy matching here
    # resolves the ambiguity the same way. The trailing (/?) can only
    # match a '/' that follows the tag name, whitespace, or a quote.
    # Whitespace here is html.parser's tag-name stop set [ \t\n\r\f],
    # NOT regex \s: \s includes \x0b/\x1c-\x1f, which html.parser
    # treats as NAME characters (<P\x0b> is tag 'p\x0b', found by
    # fuzzing) — any such byte must fall through to the slow path.
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:[ \t\n\r\f]+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:[ \t\n\r\f]*=[ \t\n\r\f]*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s>'\"=<`]+))?)*)"
    r"[ \t\n\r\f]*(/?)>"
)
_FAST_END = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)[ \t\n\r\f]*>")


def _check_whole_start_tag(s: str, i: int, n: int) -> int:
    """Mirror of HTMLParser.check_for_whole_start_tag (end-of-feed)."""
    m = _locatestarttagend_tolerant.match(s, i)
    if m is None:  # cannot happen: caller matched _starttagopen
        raise AssertionError("we should not get here!")
    j = m.end()
    nxt = s[j : j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        if s.startswith("/>", j):
            return j + 2
        if s.startswith("/", j):
            return -1  # buffer boundary (EOF here)
        if j > i:
            return j
        return i + 1
    if nxt == "":
        return -1  # end of input
    if nxt in _ALPHA_EQ_SLASH:
        return -1
    if j > i:
        return j
    return i + 1


def feed_events(s: str, handler) -> None:
    """Drive handler.handle_{starttag,endtag,startendtag,data} with the
    same event stream HTMLParser(convert_charrefs=True) would emit for
    feed(s); close(). Raises AssertionError exactly where html.parser
    does (unknown marked-section keywords) — callers that wrap
    HTMLParser in try/except get identical behavior."""
    data = handler.handle_data
    start = handler.handle_starttag
    end = handler.handle_endtag
    startend = handler.handle_startendtag
    i = 0
    n = len(s)
    cdata_elem: str | None = None
    cdata_close = None
    find = s.find
    startswith = s.startswith
    while i < n:
        if cdata_elem is None:
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                data(unescape(s[i:j]))
        else:
            m = cdata_close.search(s, i)
            if m is None:
                return  # unclosed cdata content at EOF is dropped
            j = m.start()
            if i < j:
                data(s[i:j])
        i = j
        if i == n:
            break
        # dispatch at '<' (order mirrors goahead); the char-range test
        # is _starttagopen.match without the regex-call overhead
        c = s[i + 1 : i + 2]
        if "a" <= c <= "z" or "A" <= c <= "Z":
            # ---- parse_starttag ----
            fm = _FAST_START.match(s, i)
            if fm is not None:
                tag = fm.group(1).lower()
                if fm.group(3):
                    startend(tag, ())
                else:
                    start(tag, ())
                    if tag in _CDATA_ELEMS:
                        cdata_elem = tag
                        cdata_close = re.compile(
                            r"</\s*%s\s*>" % tag, re.IGNORECASE
                        )
                i = fm.end()
                continue
            # slow path: mirror check_for_whole_start_tag exactly; the
            # locate regex stops right before '>' for well-formed tags
            lm = _locatestarttagend_tolerant.match(s, i)
            j2 = lm.end()
            nxt = s[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            else:
                endpos = _check_whole_start_tag(s, i, n)
            if endpos >= 0:
                tm = _tagfind_tolerant.match(s, i + 1)
                tag = tm.group(1).lower()
                k = tm.end()
                while k < endpos:
                    am = _attrfind_tolerant.match(s, k)
                    if am is None:
                        break
                    k = am.end()
                tail = s[k:endpos].strip()
                if tail not in (">", "/>"):
                    data(s[i:endpos])  # junk start tag: raw, NOT unescaped
                elif tail.endswith("/>"):
                    startend(tag, ())
                else:
                    start(tag, ())
                    if tag in _CDATA_ELEMS:
                        cdata_elem = tag
                        cdata_close = re.compile(
                            r"</\s*%s\s*>" % tag, re.IGNORECASE
                        )
            k = endpos
        elif startswith("</", i):
            # ---- parse_endtag ----
            fm = _FAST_END.match(s, i)
            if fm is not None and cdata_elem is None:
                end(fm.group(1).lower())
                i = fm.end()
                continue
            gm = _endendtag.search(s, i + 1)
            if gm is None:
                k = -1
            else:
                gtpos = gm.end()
                em = _endtagfind.match(s, i)
                if em is None:
                    if cdata_elem is not None:
                        data(s[i:gtpos])
                        k = gtpos
                    else:
                        nm = _tagfind_tolerant.match(s, i + 2)
                        if nm is None:
                            if s[i : i + 3] == "</>":
                                k = i + 3
                            else:  # bogus comment: consume to '>'
                                pos = find(">", i + 2)
                                k = -1 if pos == -1 else pos + 1
                        else:
                            end(nm.group(1).lower())
                            k = find(">", nm.end()) + 1
                else:
                    elem = em.group(1).lower()
                    if cdata_elem is not None and elem != cdata_elem:
                        data(s[i:gtpos])
                        k = gtpos
                    else:
                        end(elem)
                        cdata_elem = None
                        cdata_close = None
                        k = gtpos
        elif startswith("<!--", i):
            cm = _commentclose.search(s, i + 4)
            k = -1 if cm is None else cm.end()
        elif startswith("<?", i):
            pos = find(">", i + 2)
            k = -1 if pos == -1 else pos + 1
        elif startswith("<!", i):
            # ---- parse_html_declaration ----
            if startswith("<![", i):
                # marked section (mirrors _markupbase.parse_marked_section)
                if i + 3 == n:
                    k = -1
                else:
                    dm = _declname.match(s, i + 3)
                    if dm is None:
                        raise AssertionError(
                            "expected name token at %r" % s[i : i + 20]
                        )
                    if dm.end() == n:
                        k = -1
                    else:
                        name = dm.group().strip().lower()
                        if name in ("temp", "cdata", "ignore", "include", "rcdata"):
                            mm = _markedsectionclose.search(s, i + 3)
                        elif name in ("if", "else", "endif"):
                            mm = _msmarkedsectionclose.search(s, i + 3)
                        else:
                            raise AssertionError(
                                "unknown status keyword %r in marked section"
                                % s[i + 3 : dm.end()]
                            )
                        k = -1 if mm is None else mm.end()
            elif s[i : i + 9].lower() == "<!doctype":
                pos = find(">", i + 9)
                k = -1 if pos == -1 else pos + 1
            else:  # bogus comment
                pos = find(">", i + 2)
                k = -1 if pos == -1 else pos + 1
        elif i + 1 < n:
            data("<")
            k = i + 1
        else:
            data("<")  # lone '<' at EOF: goahead(1) tail re-emits it
            break
        if k < 0:
            # incomplete construct at EOF: goahead(end=True) recovery
            k = find(">", i + 1)
            if k < 0:
                k = find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            if cdata_elem is None:
                data(unescape(s[i:k]))
            else:
                data(s[i:k])
        i = k
