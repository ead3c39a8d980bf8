"""Gates for distributed BPE training (operators/bpe.py):
the Sennrich et al. (2016) worked example reproduces exactly,
training is deterministic and partition-invariant, tokenization
round-trips back to the normalized text, and the vocab-cap /
freq-floor levers behave.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark.operators.bpe import (  # noqa: E402
    EOW,
    bpe_tokens_col,
    detokenize,
    segment_word,
    train_bpe,
    word_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def _sennrich_corpus(spark):
    # the paper's worked example as a corpus: low x5, lower x2,
    # newest x6, widest x3
    rows = [(0, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sennrich_worked_example(spark):
    merges = train_bpe(_sennrich_corpus(spark), num_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("lowest", ranks) == ("low", "est" + EOW)
    assert segment_word("newest", ranks) == ("n", "e", "w", "est" + EOW)


def test_training_is_deterministic_and_partition_invariant(spark, docs):
    a = train_bpe(docs, num_merges=40)
    b = train_bpe(docs, num_merges=40)
    c = train_bpe(docs.repartition(7), num_merges=40)
    assert a == b == c and len(a) == 40


def test_tokenize_round_trip(spark, docs):
    merges = train_bpe(docs, num_merges=40)
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    out = docs.select(
        F.array_join(w, " ").alias("norm"),
        detokenize(bpe_tokens_col(merges)(F.col("text"))).alias("rt"),
        F.size(w).alias("n_words"),
        F.size(bpe_tokens_col(merges)(F.col("text"))).alias("n_tokens"),
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["rt"] == r["norm"]
        assert r["n_tokens"] >= r["n_words"]


def test_pair_occurring_twice_in_one_word(spark):
    """Regression: a word containing the winning pair twice (abxab)
    must merge cleanly — the incremental bookkeeping's first
    occurrence empties the pair's word-set before the second one."""
    rows = [(0, " ".join(["abxab"] * 5 + ["ab"] * 2))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, num_merges=3)
    assert merges[0] == ("a", "b")
    ranks = {p: i for i, p in enumerate(merges)}
    seg = segment_word("abxab", ranks)
    # both ab occurrences merged: no adjacent (a, b) survives
    assert ("a", "b") not in set(zip(seg, seg[1:])), seg


def test_vocab_levers(spark, docs):
    # freq floor on the controlled corpus: min_freq=3 drops lower(x2)
    sc = _sennrich_corpus(docs.sparkSession)
    assert word_counts(sc).count() == 4
    assert word_counts(sc).filter(F.col("count") >= 3).count() == 3
    merges_floored = train_bpe(sc, num_merges=3, min_freq=3)
    assert ("e", "r") not in merges_floored  # 'lower' excluded entirely
    # capping the dictionary still trains deterministically
    a = train_bpe(docs, num_merges=10, max_vocab_words=200)
    b = train_bpe(docs.repartition(5), num_merges=10, max_vocab_words=200)
    assert a == b and len(a) == 10
