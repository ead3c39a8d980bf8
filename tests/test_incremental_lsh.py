"""Gates for incremental MinHash-LSH dedup against a persisted index.

Soundness rests on index associativity — index(A ∪ B) == index(A) ∪
index(B) as exact row sets — pinned first. Then: the incremental path
over (new=B, index(A)) must find the batch pipeline's exact-verified
pairs that touch B (recall gate), must never emit historical-only
pairs, its estimator must track exact Jaccard, and a persisted
(parquet round-tripped) index must behave identically to a live one.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark.operators.dedup import (  # noqa: E402
    minhash_index,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
)

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.5


@pytest.fixture(scope="module")
def split(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return docs, hist, new


def test_index_is_associative(split):
    docs, hist, new = split
    def rows(df):
        return {
            (r["id"], r["band"], r["bucket"], tuple(r["sig"])) for r in df.collect()
        }

    whole = rows(minhash_index(docs))
    parts = rows(minhash_index(hist)) | rows(minhash_index(new))
    assert whole == parts and len(whole) > 0


def test_incremental_finds_batch_pairs_touching_new(split):
    docs, hist, new = split
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=THRESHOLD).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    touching = {p for p in exact if p[0] in new_ids or p[1] in new_ids}
    inc = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs_incremental(
            new, minhash_index(hist), threshold=THRESHOLD
        ).collect()
    }
    # no historical-only pairs, ever
    for a, b in inc:
        assert a in new_ids or b in new_ids, (a, b)
    assert touching, "fixture must contain near-dup pairs touching the new batch"
    found = len(touching & set(inc))
    assert found / len(touching) >= 0.8, (found, len(touching))
    # the estimator tracks exact Jaccard on the commonly-found pairs
    for p in touching & set(inc):
        assert abs(inc[p] - exact[p]) <= 0.25, (p, inc[p], exact[p])


def test_persisted_index_round_trip(split, tmp_path, spark):
    docs, hist, new = split
    path = str(tmp_path / "lsh_index.parquet")
    minhash_index(hist).write.parquet(path)
    live = sorted(
        tuple(r)
        for r in minhash_lsh_pairs_incremental(
            new, minhash_index(hist), threshold=THRESHOLD
        ).collect()
    )
    persisted = sorted(
        tuple(r)
        for r in minhash_lsh_pairs_incremental(
            new, spark.read.parquet(path), threshold=THRESHOLD
        ).collect()
    )
    assert live == persisted and len(live) > 0


def test_partitioned_store_prunes_and_matches(split, tmp_path, spark):
    """write_lsh_index / minhash_lsh_pairs_vs_stored (r05): the
    (band, pb)-partitioned store must (a) produce the IDENTICAL pair
    set as the in-memory incremental path, (b) carry a partition
    filter in the historical scan, (c) survive compaction with byte-
    identical results and fewer files, and (d) enforce its layout
    contract via _meta."""
    import contextlib
    import io
    import re

    from nidaba_spark.operators.dedup import (
        compact_lsh_index,
        minhash_lsh_pairs_vs_stored,
        read_lsh_index,
        write_lsh_index,
    )

    docs, hist, new = split
    path = str(tmp_path / "lsh_store")
    h1 = hist.filter(F.col("doc_id") % 4 == 0)
    h2 = hist.filter(F.col("doc_id") % 4 == 2)
    write_lsh_index(h1, path, batch_id=0, pbuckets=16)
    write_lsh_index(h2, path, batch_id=1, pbuckets=16)
    # store union == live index rows (associativity through the store)
    stored = {
        (r["id"], r["band"], r["bucket"], tuple(r["sig"]))
        for r in read_lsh_index(spark, path).collect()
    }
    live_rows = {
        (r["id"], r["band"], r["bucket"], tuple(r["sig"]))
        for r in minhash_index(hist).collect()
    }
    assert stored == live_rows

    want = sorted(
        tuple(r)
        for r in minhash_lsh_pairs_incremental(
            new, minhash_index(hist), threshold=THRESHOLD
        ).collect()
    )
    df = minhash_lsh_pairs_vs_stored(new, path, threshold=THRESHOLD)
    got = sorted(tuple(r) for r in df.collect())
    assert got == want and len(got) > 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    assert re.search(r"PartitionFilters: \[[^\]]*(band|pb)[^\]]*\]", buf.getvalue())

    info = compact_lsh_index(spark, path)
    assert info["files_after"] < info["files_before"]
    import glob

    assert glob.glob(f"{path}/rows/batch=*") == [f"{path}/rows/batch=0"]
    again = sorted(
        tuple(r)
        for r in minhash_lsh_pairs_vs_stored(new, path, threshold=THRESHOLD).collect()
    )
    assert again == want

    # layout contract: a mismatched append is rejected AT WRITE TIME
    # (it used to succeed and poison every later read, detected
    # batches away from its cause); the read-side "mixed layouts"
    # guard still backstops an index corrupted by other means
    with pytest.raises(ValueError, match="this append passed"):
        write_lsh_index(h1, path, batch_id=9, pbuckets=32)
    again2 = sorted(
        tuple(r)
        for r in minhash_lsh_pairs_vs_stored(new, path, threshold=THRESHOLD).collect()
    )
    assert again2 == want  # the rejected append left the index intact


def test_incremental_determinism(split):
    _, hist, new = split
    a = sorted(
        tuple(r)
        for r in minhash_lsh_pairs_incremental(
            new, minhash_index(hist), threshold=THRESHOLD
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in minhash_lsh_pairs_incremental(
            new.repartition(7), minhash_index(hist.repartition(5)), threshold=THRESHOLD
        ).collect()
    )
    assert a == b


def test_legacy_meta_append_not_mixed(tmp_path, spark):
    # ADVICE r05 #1: appending a new 4-column _meta batch beside a
    # legacy 3-column one must NOT read as 'mixed layouts' (the legacy
    # NULL shingle_k means the then-hardwired default 3), regardless
    # of which file Spark samples for the schema
    import pyspark.sql.functions as F

    from nidaba_spark.operators.dedup import _lsh_meta, write_lsh_index

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "), F.col("id").cast("string")).alias("text"),
    )
    path = str(tmp_path / "idx")
    write_lsh_index(docs.filter("doc_id % 2 = 0"), path, batch_id="b0")
    # simulate the legacy layout: rewrite b0's meta without shingle_k
    spark.createDataFrame(
        [(64, 16, 64)], "num_hashes int, bands int, pbuckets int"
    ).write.mode("overwrite").parquet(f"{path}/_meta/batch=b0")
    # append a new-format batch (validates against the stored contract)
    write_lsh_index(docs.filter("doc_id % 2 = 1"), path, batch_id="b1")
    assert _lsh_meta(spark, path) == (64, 16, 64, 3)
