"""Code-content signal (operators/codesig) on hand-built documents:
line counting under every newline convention, fence pairing, keyword
boundaries, the is_code threshold on real-shaped snippets, and the
zero-shuffle/zero-Python plan shape."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.codesig import code_stats  # noqa: E402

PY_SNIPPET = (
    "def add(a, b):\n"
    "    return a + b\n"
    "\n"
    "def mul(a, b):\n"
    "    return a * b\n"
)
PROSE = (
    "The committee met on Tuesday to discuss the annual budget. "
    "Several members raised concerns about the timeline.\n"
    "A follow-up meeting was scheduled for the next week."
)
FENCED = "Intro text.\n```\nx = 1\n```\nOutro ```dangling"
CRLF = "line one\r\nline two\r\n\tcode line\r\nlast"
CR_ONLY = "line one\rline two\r\tcode line\rlast"


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    return code_stats(df).collect()[0].asDict()


def test_indent_and_keyword_detection(spark):
    r = _one(spark, PY_SNIPPET)
    assert r["n_code_lines"] == 2  # the two 4-space return lines
    assert r["n_text_lines"] == 4
    assert r["kw_hits"] == 4  # def x2, return x2
    assert r["is_code"] is True


def test_prose_is_not_code(spark):
    r = _one(spark, PROSE)
    assert r["n_code_lines"] == 0
    assert r["kw_hits"] == 0
    assert r["code_score"] < 0.2
    assert r["is_code"] is False


def test_keyword_needs_word_boundary(spark):
    r = _one(spark, "defense classic importance voids structure")
    assert r["kw_hits"] == 0


def test_fence_pairing_floors(spark):
    r = _one(spark, FENCED)
    assert r["n_fenced_blocks"] == 1  # 3 markers -> floor(3/2) = 1


def test_newline_conventions_agree(spark):
    a, b = _one(spark, CRLF), _one(spark, CR_ONLY)
    for k in ("n_code_lines", "n_text_lines", "indent_frac", "code_score"):
        assert a[k] == b[k], k
    assert a["n_text_lines"] == 4 and a["n_code_lines"] == 1


def test_empty_and_whitespace_text(spark):
    for t in ("", "   \n\t\n  "):
        r = _one(spark, t)
        assert r["n_code_lines"] == 0
        assert r["n_text_lines"] == 1  # floored denominator
        assert r["code_score"] == 0.0


def test_zero_shuffle_zero_python_plan(spark):
    df = spark.createDataFrame([(0, PY_SNIPPET)], "doc_id int, text string")
    plan = code_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exotic_java_line_terminators(spark):
    # Java (?m)^ also matches after NEL (U+0085), LS (U+2028), and PS
    # (U+2029); RE2's matches only after newline. All five terminators
    # are folded to newline before any (?m) pattern, so an indented
    # line following an exotic terminator counts exactly once — and the
    # DuckDB oracle (same RE2-expressible class) agrees. Equivalent
    # newline-separated text must produce identical rows.
    exotic = (
        "prose line" + chr(0x2028) + "    x = f(1)" + chr(0x85)
        + "more" + chr(0x2029) + "\tcode()"
    )
    plain = "prose line\n    x = f(1)\nmore\n\tcode()"
    a = _one(spark, exotic)
    b = _one(spark, plain)
    assert a == b
    assert a["n_code_lines"] == 2  # the 4-space and the tab line
    assert a["n_text_lines"] == 4
