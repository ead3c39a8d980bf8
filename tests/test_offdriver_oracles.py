"""Oracle parity for queries NOT on the frozen 50-slot driver surface.

The driver checks only the 50 entries __spark_entry__ exposes; every
oracle-bearing query beyond that cap gets the identical DuckDB
comparison here (same canonicalization as tests/test_oracle_parity.py),
so "off the driver surface" never means "unchecked".

Also pins the semantics of the r04 corpus-hygiene filters directly on
hand-built rows (repetition fractions, decontamination overlap, PII
redaction byte-exactness) independent of the synthetic corpus.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from nidaba_spark.plans import pandas_ops, relational, trainingdata  # noqa: E402
from nidaba_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")

_ALL_Q = {**pandas_ops.QUERIES, **relational.QUERIES, **trainingdata.QUERIES}
_ALL_O = {**pandas_ops.ORACLE, **relational.ORACLE, **trainingdata.ORACLE}
_ON_DRIVER = set(entrymod.queries())
OFF_DRIVER_ORACLES = sorted(set(_ALL_O) - _ON_DRIVER)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def test_rotation_keeps_every_oracle_checked():
    """r05 surface rotation (VERDICT r04 next #2): the 11 hygiene /
    training-data queries moved ONTO the driver surface, 11 long-green
    relational rows moved off. Rotated-out rows must keep the identical
    comparison here; rotated-in rows must actually hold driver slots."""
    for name in (
        "events_per_hour",
        "acctbal_buckets",
        "props_map",
        "events_json",
        "region_event_grid",
        "intersect_except_customers",
        "distinct_users_per_type",
        "supplier_nation",
        "top_docs_by_chars",
        "top_words",
        "customers_without_orders",
    ):
        assert name in OFF_DRIVER_ORACLES, f"{name} lost its oracle coverage"
    for name in (
        "repetition_filter",
        "decontaminate",
        "decontaminate_bloom",
        "redact_pii",
        "quality_model_score",
        "paragraph_dedup",
        "duplicate_spans",
        "split_assign",
        "bm25_search",
        "unigram_logprob",
        "pack_documents",
    ):
        assert name in _ON_DRIVER, f"{name} fell off the driver surface"


@pytest.mark.parametrize("name", OFF_DRIVER_ORACLES)
def test_offdriver_query_matches_oracle(spark, name):
    sdf = _ALL_Q[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_DIR)
    res = con.execute(_ALL_O[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    diff = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
    assert sset == dset, f"{name}: value mismatch, first diffs {diff}"


# ---------------------------------------------------------- semantics


def test_repetition_stats_hand_case(spark):
    from nidaba_spark.operators.filters import repetition_stats

    docs = spark.createDataFrame(
        [
            # bigrams: "a b","b a","a b","b a","a b" -> top "a b" 3/5,
            # distinct 2 -> dup = 1 - 2/5 = 0.6
            (1, "a b a b a b"),
            (2, "one two three four"),  # all distinct: top 1/3, dup 0
            (3, "single"),  # <2 words: no row
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_bigrams"] == 5
    assert got[1]["top_bigram_frac"] == 0.6
    assert got[1]["dup_bigram_frac"] == 0.6
    assert got[2]["n_bigrams"] == 3
    assert got[2]["top_bigram_frac"] == round(1 / 3, 4)
    assert got[2]["dup_bigram_frac"] == 0.0


def test_decontaminate_hand_case(spark):
    from nidaba_spark.operators.filters import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares exactly "the quick brown fox jumps" with eval
            (1, "xx the quick brown fox jumps yy"),
            (2, "completely different words here entirely now"),
            (3, "short text"),  # < 5 words
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_overlap"] for r in decontaminate(train, eval_df, n=5).collect()}
    assert got == {1: 1}


def test_decontaminate_fuzzy_hand_case(spark):
    """The fuzzy rule flags on per-eval-ITEM gram coverage: 3/5 of the
    eval item's grams (0.6) flags at threshold 0.5, 1/5 (0.2) does
    not — where the exact any-shared-gram rule would flag both."""
    from nidaba_spark.operators.filters import decontaminate_fuzzy

    eval_df = spark.createDataFrame(
        [(100, "a b c d e f g h i"), (101, "too few")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "a b c d e f g zz"),  # shares 3 of eval 100's 5 grams
            (2, "x y a b c d e"),  # shares 1 of 5 -> below 0.5
            (3, "completely different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    rows = decontaminate_fuzzy(train, eval_df, n=5, threshold=0.5).collect()
    assert [(r["doc_id"], r["eval_id"]) for r in rows] == [(1, 100)]
    assert rows[0]["n_shared"] == 3
    assert rows[0]["eval_grams"] == 5
    assert rows[0]["overlap_frac"] == 0.6
    # at a looser threshold the 1/5 pair appears too
    loose = decontaminate_fuzzy(train, eval_df, n=5, threshold=0.2)
    got = {(r["doc_id"], r["eval_id"]): r["overlap_frac"] for r in loose.collect()}
    assert got == {(1, 100): 0.6, (2, 100): 0.2}


PARA_DOCS = [
    (1, "alpha one\n\nshared para\n\nbeta two"),  # all first: unchanged
    (2, "shared para\n\ngamma three"),  # loses the shared paragraph
    (3, "unique three\n\nunique three"),  # intra-doc dup: first copy kept
    (4, ""),  # empty in, empty out
    (5, "shared para"),  # reduced to nothing -> ''
]


def test_paragraph_dedup_hand_case(spark):
    from nidaba_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in paragraph_dedup(docs).collect()}
    assert got == {
        1: "alpha one\n\nshared para\n\nbeta two",
        2: "gamma three",
        3: "unique three",
        4: "",
        5: "",
    }
    # the same structured rows through the DuckDB oracle SQL
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(PARA_DOCS, columns=["doc_id", "text"])
    )
    want = dict(con.execute(_ALL_O["paragraph_dedup"]).fetchall())
    con.close()
    assert got == want


def test_paragraph_dedup_plan_has_window_group_limit(spark):
    import contextlib
    import io

    from nidaba_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        paragraph_dedup(docs).explain(mode="formatted")
    # duplicate paragraphs must be pruned map-side before the exchange
    assert "WindowGroupLimit" in buf.getvalue()


def test_duplicate_spans_plan_shape(spark):
    import contextlib
    import io

    from nidaba_spark.plans.trainingdata import q_duplicate_spans

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_duplicate_spans(spark, SF_DIR).explain(mode="formatted")
    plan = buf.getvalue()
    # span counting must partial-aggregate map-side (>=2 HashAggregate
    # pairs: span counts + per-doc rollup) and never cross-product
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan


def test_duplicate_span_stats_hand_case(spark):
    from nidaba_spark.operators.filters import duplicate_span_stats

    docs = spark.createDataFrame(
        [
            # 4 words -> 2 trigram spans: "a b c" (shared with doc 2),
            # "b c d" (unique) -> frac 0.5
            (1, "a b c d"),
            (2, "a b c"),  # its only span duplicated -> frac 1.0
            (3, "x y z w"),  # both spans unique -> frac 0.0
            (4, "e e e e"),  # intra-doc repeat "e e e" x2 -> frac 1.0
            (5, "too short"),  # < n words: no row
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_span_frac"])
        for r in duplicate_span_stats(docs, n=3).collect()
    }
    assert got == {1: (2, 0.5), 2: (1, 1.0), 3: (2, 0.0), 4: (2, 1.0)}


def test_redact_pii_bytes(spark):
    from pyspark.sql import functions as F

    from nidaba_spark.operators.filters import pii_counts, redact_pii

    df = spark.createDataFrame(
        [("mail a@b.co x c@d.org call +1 555-010-0042 from 192.168.3.9 end",)],
        "text string",
    )
    row = df.select(
        redact_pii(F.col("text")).alias("red"), *pii_counts(F.col("text"))
    ).collect()[0]
    assert row["red"] == "mail <EMAIL> x <EMAIL> call <PHONE> from <IP> end"
    assert (row["n_email"], row["n_phone"], row["n_ip"]) == (2, 1, 1)


def test_unigram_logprob_hand_case(spark):
    import math

    from nidaba_spark.operators.textstats import unigram_logprob

    # corpus: "a a b" + "b c" -> counts a=2 b=2 c=1, N=5
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in unigram_logprob(docs).collect()}
    lp = lambda c: math.log10(c / 5.0)  # noqa: E731
    assert got[1]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == round((2 * lp(2) + lp(2)) / 3, 6)
    assert got[2]["n_tokens"] == 2
    assert got[2]["avg_logprob"] == round((lp(2) + lp(1)) / 2, 6)


def test_unigram_logprob_hot_cold_split_is_invisible(spark):
    # n_hot=1 forces a real hot/cold split on a tiny vocab; results
    # must equal the single-join semantics (n_hot huge).
    from nidaba_spark.operators.textstats import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "x x y z"), (2, "x y y w"), (3, "w z z x")],
        "doc_id long, text string",
    )
    a = {tuple(r) for r in unigram_logprob(docs, n_hot=1).collect()}
    b = {tuple(r) for r in unigram_logprob(docs, n_hot=10_000).collect()}
    assert a == b


OFF_DRIVER_ROWS_ONLY = sorted(set(_ALL_Q) - _ON_DRIVER - set(_ALL_O))


@pytest.mark.parametrize("name", OFF_DRIVER_ROWS_ONLY)
def test_off_driver_rows_only_queries_run(spark, name):
    """Every exported-but-off-driver rows-only QUERY FUNCTION still
    runs with a stable schema (their semantics are gated in dedicated
    test files; this catches wiring regressions in the q_ plumbing)."""
    df = _ALL_Q[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_remove_duplicate_spans_hand_case(spark):
    from nidaba_spark.operators.filters import remove_duplicate_spans

    rows = [
        (1, "a b c d"),  # "a b c" shared with doc 2 -> keep only "d"
        (2, "a b c"),  # fully covered -> ''
        (3, "x y z w"),  # both spans unique -> untouched
        (4, "e e e e"),  # intra-doc repeat covers all 4 positions
        (5, "too short"),  # < n words: no spans, survives whole
        (6, ""),  # empty in, empty out (sequence(1,0) guard)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        1: (4, 3, "d"),
        2: (3, 3, ""),
        3: (4, 0, "x y z w"),
        4: (4, 4, ""),
        5: (2, 0, "too short"),
        6: (0, 0, ""),
    }
    for hash_keys in (False, True):  # string- and xxhash64-keyed forms agree
        got = {
            r["doc_id"]: (r["n_words"], r["n_removed_words"], r["clean_text"])
            for r in remove_duplicate_spans(docs, n=3, hash_keys=hash_keys).collect()
        }
        assert got == want, f"hash_keys={hash_keys}: {got}"


_C4_GOOD = (
    "a good first sentence with five words here.\n"
    "short one.\n"
    "no terminal punctuation on this long line here\n"
    "  second good sentence line with enough words inside.  \n"
    "third fine sentence line with plenty of words too."
)


def test_c4_clean_hand_case(spark):
    from nidaba_spark.operators.filters import c4_clean

    rows = [
        (1, _C4_GOOD),
        (2, _C4_GOOD + "\nsee the javascript line with many words right here."),
        (3, _C4_GOOD + "\na code brace { lives here with many more words."),
        (4, _C4_GOOD + "\nclassic lorem ipsum filler with enough words appears."),
        (5, _C4_GOOD + "\nthe blocked word porn sinks this entire page now."),
        (6, "only two good sentences live on this page today.\n"
            "so the page falls under the sentence minimum rule."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_kept_lines"], r["n_sentences"], r["c4_keep"], r["text"])
        for r in c4_clean(docs).collect()
    }
    kept_good = (
        "a good first sentence with five words here.\n"
        "second good sentence line with enough words inside.\n"
        "third fine sentence line with plenty of words too."
    )
    assert got[1] == (3, 3, True, kept_good)
    # javascript line is LINE-dropped, page survives
    assert got[2] == (3, 3, True, kept_good)
    # page rules fire on the ORIGINAL text even when the line survives
    assert got[3][2] is False and got[3][0] == 4
    assert got[4][2] is False
    assert got[5][2] is False
    # both lines survive the line filter but 2 sentences < 3
    assert got[6] == (2, 2, False, rows[5][1])


def test_c4_clean_plan_is_shuffle_free(spark):
    import contextlib
    import io

    from nidaba_spark.operators.filters import c4_clean

    docs = spark.createDataFrame([(1, _C4_GOOD)], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        c4_clean(docs).filter("c4_keep").explain(mode="formatted")
    # pure scan-level map: the whole operator must add zero Exchanges
    assert "Exchange" not in buf.getvalue()


def test_c4_clean_is_idempotent(spark):
    """Every line c4_clean keeps satisfies the line predicate, so a
    second pass keeps everything: clean(clean(x)) == clean(x).
    One DataFrame of combinatorial pages (ending char × word count ×
    javascript × whitespace), both passes in one collect each."""
    import itertools
    import random

    from nidaba_spark.operators.filters import c4_clean

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    lines = []
    for end, nw, js, pad in itertools.product(
        [".", "!", '"', "", "x"], [0, 2, 5, 9], [False, True], [False, True]
    ):
        ws = [rng.choice(words) for _ in range(nw)]
        if js and ws:
            ws[0] = "javascript"
        body = " ".join(ws) + end
        lines.append(("  " + body + " ") if pad else body)
    pages = [
        (i, "\n".join(rng.sample(lines, rng.randint(0, 10))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(pages, "doc_id long, text string")
    once = c4_clean(docs).select("doc_id", "text", "n_kept_lines", "n_sentences")
    twice = c4_clean(once.select("doc_id", "text")).select(
        "doc_id", "text", "n_kept_lines", "n_sentences"
    )
    a = {r["doc_id"]: tuple(r)[1:] for r in once.collect()}
    b = {r["doc_id"]: tuple(r)[1:] for r in twice.collect()}
    assert a == b
    assert any(v[1] > 0 for v in a.values())  # some lines actually survive


def test_gopher_quality_rule_trips(spark):
    """Each Gopher §A1.1 rule tripped in isolation on hand-built docs
    (the good doc differs from each bad one by exactly the rule under
    test, minus unavoidable couplings which are asserted explicitly)."""
    from nidaba_spark.operators.filters import gopher_quality_flags

    good = "the quick brown fox jumps over lazy dogs and cats " * 6  # 60 words
    rows = [
        (1, good),
        (2, "the of and that have short doc"),  # < 50 words
        (3, ("a b " * 30) + "the of and that have with"),  # mean word len < 3
        (4, ("1234 5678 " * 30) + "the of and that"),  # alpha frac < 0.8
        (5, good + ("# " * 20)),  # symbol ratio >= 0.1
        (6, "\n".join(["- bullet item here"] * 19 + [good])),  # 95% bullets
        (7, "\n".join([good] + ["more text here..."] * 2)),  # 2/3 ellipsis lines
        (8, "quick brown fox jumps over lazy dogs " * 8),  # no required stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(docs, min_words=50).collect()}
    assert got[1]["gopher_keep"] is True
    assert got[2]["gopher_keep"] is False and got[2]["n_words"] < 50
    assert got[3]["gopher_keep"] is False and got[3]["mean_word_len"] < 3
    assert got[4]["gopher_keep"] is False and got[4]["alpha_word_frac"] < 0.8
    assert got[5]["gopher_keep"] is False and got[5]["symbol_ratio"] >= 0.1
    assert got[6]["gopher_keep"] is False and got[6]["bullet_line_frac"] >= 0.9
    assert got[7]["gopher_keep"] is False and got[7]["ellipsis_line_frac"] > 0.3
    assert got[8]["gopher_keep"] is False and got[8]["n_required_stopwords"] < 2
    assert got[8]["n_words"] >= 50  # rule 8 trips ONLY the stopword rule
