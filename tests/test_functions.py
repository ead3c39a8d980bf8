"""Unit + property tests for the pure extraction core (SURVEY.md §5.2.3/4)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nidaba_spark.functions.charset import decode_bytes, sniff_charset
from nidaba_spark.functions.classify_rules import classify_block
from nidaba_spark.functions.htmlseg import segment_html
from nidaba_spark.functions.pdfx import parse_pdfx
from nidaba_spark.functions.textnorm import normalize_text


# -- textnorm ---------------------------------------------------------
@given(st.text(max_size=500))
@settings(max_examples=200)
def test_normalize_idempotent(s):
    assert normalize_text(normalize_text(s)) == normalize_text(s)


def test_normalize_basics():
    assert normalize_text("  a\t\nb c  ") == "a b c"
    assert normalize_text("x​y") == "xy"
    assert normalize_text("") == ""


# -- charset ----------------------------------------------------------
def test_charset_bom():
    assert sniff_charset(b"\xef\xbb\xbfhello") == "utf-8-sig"
    assert decode_bytes(b"\xef\xbb\xbfhello")[0] == "hello"


def test_charset_meta():
    raw = b'<html><head><meta charset="iso-8859-1"></head><body>caf\xe9</body></html>'
    text, cs = decode_bytes(raw)
    assert cs == "latin-1" and "café" in text


def test_charset_fallback_ladder():
    assert decode_bytes("héllo".encode("utf-8"))[1] == "utf-8"
    assert decode_bytes(b"caf\xe9 no meta")[1] == "latin-1"
    assert decode_bytes(b"")[1] == "empty"


@given(st.binary(max_size=2000))
@settings(max_examples=200)
def test_decode_never_raises(raw):
    text, cs = decode_bytes(raw)
    assert isinstance(text, str) and isinstance(cs, str)


# -- htmlseg ----------------------------------------------------------
def test_segment_basic_blocks():
    html = "<body><p>one two three</p><p>four five</p></body>"
    blocks = segment_html(html)
    assert [b.text for b in blocks] == ["one two three", "four five"]
    assert [b.tag for b in blocks] == ["p", "p"]
    assert blocks[0].n_words == 3 and blocks[0].link_density == 0.0


def test_segment_link_density():
    html = '<body><li><a href="/">home page</a></li></body>'
    (b,) = segment_html(html)
    assert b.link_density == 1.0 and b.n_anchor_words == 2


def test_segment_skips_script_style_comments():
    html = "<body><script>var x=1;</script><!-- nope --><style>p{}</style><p>keep this text</p></body>"
    blocks = segment_html(html)
    assert [b.text for b in blocks] == ["keep this text"]


def test_segment_entities_and_unclosed():
    blocks = segment_html("<body><p>a &amp; b<p>c d</body>")
    assert [b.text for b in blocks] == ["a & b", "c d"]


@given(st.text(max_size=1000))
@settings(max_examples=100)
def test_segment_never_raises(s):
    for b in segment_html(s):
        assert b.text == normalize_text(b.text) and b.n_chars == len(b.text)


# -- pdfx ---------------------------------------------------------------
def test_pdfx_reading_order():
    body = 'PDFX\npage 612 792\nrun 72 118 "third line"\nrun 72 90 "first"\nrun 162 90 "line"\nrun 72 104 "second line"\n'
    assert parse_pdfx(body) == ["first line", "second line", "third line"]


def test_pdfx_two_columns():
    body = (
        "PDFX\npage 612 792\n"
        'run 400 90 "right top"\nrun 72 104 "left bottom"\n'
        'run 72 90 "left top"\nrun 400 104 "right bottom"\n'
    )
    assert parse_pdfx(body) == ["left top", "left bottom", "right top", "right bottom"]


@given(st.text(max_size=500))
@settings(max_examples=100)
def test_pdfx_never_raises(s):
    assert isinstance(parse_pdfx(s), list)


# -- classifier spec ----------------------------------------------------
def test_classifier_rules():
    # link-dense is always boilerplate
    assert not classify_block(100, 0.9, 100, 0.0, 100)
    # long block after low-link prev is content
    assert classify_block(17, 0.0, 0, 0.0, 0)
    assert not classify_block(16, 0.0, 0, 0.0, 0)
    # short block pulled in by wordy neighbors
    assert classify_block(3, 0.0, 5, 0.0, 0)
    assert classify_block(3, 0.0, 0, 0.0, 16)
    # after a link-dense prev the bar is higher
    assert not classify_block(17, 0.0, 3, 0.9, 0)
    assert classify_block(41, 0.0, 3, 0.9, 0)
