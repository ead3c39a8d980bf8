"""BM25 gates (operators/search.py): hand-computed reference on a
tiny controlled corpus, ranking sanity (tf and doc-length effects),
deterministic tie-break, plan shape (TakeOrdered, no SinglePartition
window), and partition invariance. The corpus-scale oracle row runs
in tests/test_offdriver_oracles.py."""

from __future__ import annotations

import contextlib
import io
import math
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.search import bm25_topk  # noqa: E402

DOCS = [
    (0, "apple banana cherry date"),
    (1, "apple apple apple banana"),
    (2, "zebra yak xylophone walrus"),
    (3, "apple"),
    (4, "banana banana cherry cherry cherry fig grape honey iris jack"),
]


def _ref_bm25(query, k1=1.2, b=0.75):
    words = {i: t.split() for i, t in DOCS}
    n = len(words)
    avgdl = sum(len(w) for w in words.values()) / n
    out = {}
    for i, w in words.items():
        s = 0.0
        for t in set(query):
            tf = w.count(t)
            if not tf:
                continue
            df = sum(1 for ww in words.values() if t in ww)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if s:
            out[i] = round(s, 4)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_hand_reference(spark, docs):
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["apple", "banana"], k=10).collect()}
    assert got == _ref_bm25(["apple", "banana"])


def test_ranking_semantics(spark, docs):
    rows = bm25_topk(docs, ["apple"], k=10).collect()
    order = [r["doc_id"] for r in rows]
    # doc 1 (tf=3, dl=4: 3/4.082 = 0.735·idf) edges doc 3 (tf=1, dl=1:
    # 1/1.496 = 0.668·idf) — tf saturation vs length normalization —
    # then doc 0 (tf=1, dl=4); docs 2/4 (no apple) absent
    assert order == [1, 3, 0]
    rows = bm25_topk(docs, ["cherry"], k=10).collect()
    assert [r["doc_id"] for r in rows] == [4, 0]  # 3x cherry wins


def test_topk_and_tie_break(spark, docs):
    assert len(bm25_topk(docs, ["apple", "banana", "cherry"], k=2).collect()) == 2
    # identical docs tie -> lower doc_id first
    two = spark.createDataFrame(
        [(7, "same words here"), (5, "same words here")], "doc_id long, text string"
    )
    rows = bm25_topk(two, ["same"], k=2).collect()
    assert [r["doc_id"] for r in rows] == [5, 7]
    assert rows[0]["score"] == rows[1]["score"]


def test_plan_shape_and_partition_invariance(spark, docs):
    df = bm25_topk(docs.repartition(5), ["apple", "banana"], k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert not re.findall(r"\(\d+\) Window\b", plan), plan[:1500]
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r) for r in bm25_topk(docs.repartition(2), ["apple", "banana"], k=10).collect()]
    assert a == b


def test_postings_index_parity_and_pruning(spark, docs, tmp_path):
    from nidaba_spark.operators.search import (
        bm25_topk,
        bm25_topk_postings,
        build_postings,
    )

    path = str(tmp_path / "idx")
    build_postings(docs, path, buckets=16)
    for q in (["apple", "banana"], ["cherry"], ["apple", "zebra", "fig"]):
        direct = [tuple(r) for r in bm25_topk(docs, q, k=10).collect()]
        via_idx = [
            tuple(r)
            for r in bm25_topk_postings(spark, path, q, k=10, buckets=16).collect()
        ]
        assert via_idx == direct, q
    # the postings scan is partition-pruned to the query's hash buckets
    df = bm25_topk_postings(spark, path, ["apple"], k=10, buckets=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan)
    assert m, plan[:2500]


def test_postings_incremental_append(spark, docs, tmp_path):
    from nidaba_spark.operators.search import (
        append_postings,
        bm25_topk,
        bm25_topk_postings,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "inc_idx")
    append_postings(docs.filter(F.col("doc_id") < 3), path, batch_id=0, buckets=16)
    append_postings(docs.filter(F.col("doc_id") >= 3), path, batch_id=1, buckets=16)
    for q in (["apple", "banana"], ["cherry"]):
        whole = [tuple(r) for r in bm25_topk(docs, q, k=10).collect()]
        inc = [
            tuple(r)
            for r in bm25_topk_postings(spark, path, q, k=10, buckets=16).collect()
        ]
        assert inc == whole, q
    # idempotent replay: rewriting batch 1 changes nothing
    append_postings(docs.filter(F.col("doc_id") >= 3), path, batch_id=1, buckets=16)
    again = [
        tuple(r)
        for r in bm25_topk_postings(
            spark, path, ["apple", "banana"], k=10, buckets=16
        ).collect()
    ]
    assert again == [tuple(r) for r in bm25_topk(docs, ["apple", "banana"], k=10).collect()]


def test_build_index_cli(spark, tmp_path, monkeypatch):
    """jobs/build_index.py end-to-end: one run produces a queryable
    BM25 index, LSH index rows, and union-able HLL sketch rows."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    job = importlib.import_module("build_index")
    out = str(tmp_path / "idx")
    monkeypatch.setattr(_sys, "argv", [
        "build_index.py", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out, "--buckets", "16",
    ])
    job.main()
    from nidaba_spark.operators.search import bm25_topk_postings
    from nidaba_spark.operators.sketches import union_hll

    hits = bm25_topk_postings(spark, out + "/bm25", ["data"], k=3, buckets=16).collect()
    assert len(hits) == 3 and hits[0]["score"] >= hits[-1]["score"]
    assert spark.read.parquet(out + "/lsh").count() == 500 * 16  # docs x bands
    assert union_hll(spark.read.parquet(out + "/hll")) > 0


def test_postings_compaction_identity_and_file_bound(spark, docs, tmp_path):
    """compact_postings (VERDICT r04 next #4): a multi-batch index
    collapses to one batch, scores stay byte-identical, the file count
    shrinks, and the compacted layout still partition-prunes."""
    from pyspark.sql import functions as F

    from nidaba_spark.operators.search import (
        append_postings,
        bm25_topk_postings,
        compact_postings,
    )

    path = str(tmp_path / "cidx")
    append_postings(docs.filter(F.col("doc_id") < 2), path, batch_id=0, buckets=16)
    append_postings(docs.filter(F.col("doc_id") == 2), path, batch_id=1, buckets=16)
    append_postings(docs.filter(F.col("doc_id") > 2), path, batch_id=2, buckets=16)
    queries = (["apple", "banana"], ["cherry"], ["apple", "zebra", "fig"])
    before = {
        tuple(q): [tuple(r) for r in bm25_topk_postings(spark, path, q, k=10).collect()]
        for q in queries
    }
    info = compact_postings(spark, path)
    assert info["batches_before"] == 3
    assert info["postings_files_after"] < info["postings_files_before"]
    import glob

    assert glob.glob(f"{path}/postings/batch=*") == [f"{path}/postings/batch=0"]
    for q in queries:
        after = [tuple(r) for r in bm25_topk_postings(spark, path, q, k=10).collect()]
        assert after == before[tuple(q)], q
    # the compacted index still prunes to the query's hash buckets
    df = bm25_topk_postings(spark, path, ["apple"], k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    assert re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", buf.getvalue())
    # compaction is idempotent: a second pass changes nothing
    compact_postings(spark, path)
    again = [
        tuple(r)
        for r in bm25_topk_postings(spark, path, ["apple", "banana"], k=10).collect()
    ]
    assert again == before[("apple", "banana")]


def test_build_index_cli_compact_flag(spark, docs, tmp_path, monkeypatch):
    """jobs/build_index.py --compact standalone run on an existing
    multi-batch index."""
    import importlib
    import sys as _sys

    from pyspark.sql import functions as F

    from nidaba_spark.operators.search import append_postings, bm25_topk_postings

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    job = importlib.import_module("build_index")
    out = str(tmp_path / "cli_cidx")
    bm25 = os.path.join(out, "bm25")
    append_postings(docs.filter(F.col("doc_id") < 3), bm25, batch_id=0, buckets=16)
    append_postings(docs.filter(F.col("doc_id") >= 3), bm25, batch_id=1, buckets=16)
    before = [tuple(r) for r in bm25_topk_postings(spark, bm25, ["apple"], k=10).collect()]
    monkeypatch.setattr(_sys, "argv", ["build_index.py", "--output", out, "--compact"])
    job.main()
    after = [tuple(r) for r in bm25_topk_postings(spark, bm25, ["apple"], k=10).collect()]
    assert after == before
    import glob

    assert len(glob.glob(f"{bm25}/postings/batch=*")) == 1


def test_postings_bucket_contract_enforced(spark, docs, tmp_path):
    """The bucket modulus is a persisted layout contract: queries
    auto-detect it, and a wrong caller override fails loudly instead
    of silently pruning away the terms' buckets."""
    from nidaba_spark.operators.search import bm25_topk_postings, build_postings

    path = str(tmp_path / "bidx")
    build_postings(docs, path, buckets=32)
    auto = bm25_topk_postings(spark, path, ["apple"], k=5).collect()
    assert len(auto) > 0  # buckets auto-read from the index
    with pytest.raises(ValueError, match="mismatch"):
        bm25_topk_postings(spark, path, ["apple"], k=5, buckets=16)


def test_query_terms_tokenized_like_index(spark):
    # a punctuated/multi-word query must search its sub-tokens (the
    # index's own word rule), not compare whole via isin() and
    # silently match nothing
    docs = spark.createDataFrame(
        [
            (1, "state of the art systems"),
            (2, "banana banana banana"),
        ],
        "doc_id long, text string",
    )
    whole = {r["doc_id"] for r in bm25_topk(docs, ["State-of-the-Art"], k=5).collect()}
    subtok = {r["doc_id"] for r in bm25_topk(docs, ["state", "of", "the", "art"], k=5).collect()}
    assert whole == subtok == {1, 2} or whole == subtok  # identical result sets
    assert 1 in whole  # and the intended doc actually matches
