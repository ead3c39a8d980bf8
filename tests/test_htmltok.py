"""Differential equivalence: the fast tokenizer (functions/htmltok.py)
must produce IDENTICAL block lists to the stdlib html.parser backend —
over the synthetic corpus (every edge-class variant), an adversarial
fixture list targeting each tolerant/bug-compat branch of
html.parser, and hypothesis-generated fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nidaba_spark import corpus
from nidaba_spark.functions.charset import decode_bytes
from nidaba_spark.functions.htmlseg import segment_html


def _both(body: str):
    return segment_html(body, backend="fast"), segment_html(body, backend="stdlib")


def assert_equivalent(body: str) -> None:
    fast, std = _both(body)
    assert fast == std, f"backend divergence on {body[:120]!r}"


ADVERSARIAL = [
    "",
    "plain text only",
    "a < b and a & b; &amp; &#65; &#x41; &notareal; &lt",
    "<p>one<p>two</p>three",
    "<div><a href='x>y'>link</a> tail</div>",          # '>' inside quoted attr
    '<div title="a>b" >quoted gt</div>',
    "<p foo bar=baz qux='1'/>selfclose junk follows",
    "<p/ >almost self-close</p>",
    "<p <p>double open bracket",
    "<3 not a tag <p>block</p>",
    "<",
    "<p",
    "<p attr='unterminated",
    "</",
    "</>",
    "</ p>space endtag",
    "</p attr='>'>weird endtag",
    "</123>bogus end",
    "<!-- comment --><p>after comment</p>",
    "<!-- unterminated comment <p>swallowed?",
    "<!-->short comment</p>ok",
    "<!DOCTYPE html><p>doc</p>",
    "<!doctype html",
    "<![CDATA[ raw <p>cdata</p> ]]><p>after</p>",
    "<![if !IE]>ms<![endif]><p>after ms</p>",
    "<![unknownkw]><p>assertion path</p>",
    "<![",
    "<![CDATA[ unterminated",
    "<? pi content ?><p>after pi</p>",
    "<? unterminated pi",
    "<!bogus declaration><p>after bogus</p>",
    "<!bogus unterminated",
    "<script>var a = '<p>not a block</p>';</script><p>real</p>",
    "<script>unclosed script <p>dropped",
    "<SCRIPT>upper</SCRIPT><p>x</p>",
    "<script></ScRiPt ><p>case insensitive close</p>",
    "<script>a</style>b</script><p>wrong closer inside cdata</p>",
    "<style>p { color: red; }</style><p>styled</p>",
    "<template><p>skipped template</p></template><p>kept</p>",
    "<noscript><p>ns</p></noscript>",
    "<a href=x>anchor text</a> outside",
    "<p>&amp;&amp;&amp; trailing amp &",
    "trailing amp near end &aribtrarylongentityname",
    "&#unterminated charref",
    "<p>nested <b>bold <i>italic</i></b> done</p>",
    "<ul><li>one<li>two<li>three</ul>",
    "<td>cell</td><tr>row</tr><table>tbl</table>",
    "<br><hr><img src=x><input value='<p>'>",
    "<div/>xhtml empty block</div>",
    "<span/>xhtml empty inline</span>",
    "<p>\x00null byte</p>",
    "<p\x00weird>tagname with null</p>",
    "< p>space before tag name",
    "<p>unicode £ € 中文 &pound; &euro;</p>",
    "<p>many &lt;&gt;&quot;&apos;&amp;&#39;&#x27; refs</p>",
    "<a><a><a>nested anchors</a></a></a>",
    "<div><p>unclosed everywhere<div><p>more",
    "<!--[if IE]><p>conditional</p><![endif]-->",
    "text &fake &fake2; <p>mixed&#</p>",
    "<p title='multi\nline attr\tvalue'>attrs with whitespace</p>",
    "<p =bare>leading equals attr</p>",
    "<p a=1 b = '2' c=\"3\" d>mixed attrs</p>",
    "<p//>double slash</p>",
    "<p / >slash space</p>",
    # fast-path/slow-path boundary cases (strict regex vs tolerant)
    "<a href=x/>bare value eats slash: START not startend</a>",
    "<a href=x />space then slash: startend",
    "<a href=x/ >slash in value then space</a>",
    "<p attr=val/>v1</p>",
    "<p attr=\"v\"/>quoted then selfclose",
    "<p attr==x>double equals</p>",
    "<p attr=>empty bare value</p>",
    "<my-widget>custom element name</my-widget>",
    "<p a=1b=2>no space between attrs</p>",
    "<a x/y=z>slash inside attr run</a>",
    "<p `tick>backtick attr</p>",
    "</p >fast end with space",
    "</p\t>fast end with tab",
    # \x0b (vertical tab) is regex-\s but a NAME char to html.parser
    "<P\x0b>vtab glued to tag name",
    "<p\x0bclass=x>vtab before attr</p>",
    "</p\x0b>vtab in end tag",
    "<a href=\x0b>vtab as value?",
    "<p \x0c>formfeed is real whitespace</p>",
]


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_adversarial_equivalence(idx):
    assert_equivalent(ADVERSARIAL[idx])


def test_corpus_equivalence():
    """Every corpus variant class (FIXTURES.md §1), 3000 docs."""
    for k in range(3000):
        r = corpus.make_row(k)
        if r["html"]:
            body, _ = decode_bytes(r["html"])
            fast, std = _both(body)
            assert fast == std, f"divergence on corpus row {k}"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=400))
def test_fuzz_equivalence_unicode(body):
    assert_equivalent(body)


_HTMLISH = st.text(
    alphabet=list("<>&;/!?-=\"' \n\tabPDIVscript![CDATA]#x0123"),
    max_size=200,
)


@settings(max_examples=1500, deadline=None)
@given(_HTMLISH)
def test_fuzz_equivalence_htmlish(body):
    assert_equivalent(body)
