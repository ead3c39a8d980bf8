"""No-split FFD bin packing (operators/packing.pack_bins_ffd):
validity, completeness, determinism across parallelism, waste vs the
naive next-fit baseline, oversize handling, hand case.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.packing import bin_stats, pack_bins_ffd  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
CAP = 512


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", (F.col("n_chars") / 4).cast("long").alias("n_est"))
    )


def test_hand_case_single_group(spark):
    rows = [(1, 400), (2, 300), (3, 200), (4, 100), (5, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_bins_ffd(df, F.col("n"), 500, num_groups=1).collect()
    by_bin: dict[int, list[int]] = {}
    for r in out:
        by_bin.setdefault(r["bin"], []).append(r["doc_id"])
    # BFD: 400+100 | 300+200 | 100 → 3 bins (naive id-order next-fit
    # gives 400 | 300+200 | 100+100 = 3 too; the win shows at scale)
    assert len(by_bin) == 3
    fills = sorted(
        sum({1: 400, 2: 300, 3: 200, 4: 100, 5: 100}[d] for d in docs)
        for docs in by_bin.values()
    )
    assert fills == [100, 500, 500]


def test_validity_and_completeness(spark):
    docs = _docs(spark)
    out = pack_bins_ffd(docs, F.col("n_est"), CAP, num_groups=4).cache()
    n_in = docs.count()
    assert out.count() == n_in
    assert out.select("doc_id").distinct().count() == n_in
    over = (
        out.filter(~F.col("oversize"))
        .groupBy("bin")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > CAP)
        .count()
    )
    assert over == 0
    # bin_pos is a dense 0..k-1 numbering within each bin
    bad_pos = (
        out.groupBy("bin")
        .agg(F.count("*").alias("c"), F.max("bin_pos").alias("m"))
        .filter(F.col("m") != F.col("c") - 1)
        .count()
    )
    assert bad_pos == 0
    out.unpersist()


def test_oversize_docs_get_singleton_bins(spark):
    rows = [(1, 600), (2, 100), (3, 700)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = {r["doc_id"]: r for r in pack_bins_ffd(df, F.col("n"), 512).collect()}
    assert out[1]["oversize"] and out[3]["oversize"]
    assert not out[2]["oversize"]
    assert out[1]["bin"] != out[3]["bin"]
    assert out[1]["bin_pos"] == out[3]["bin_pos"] == 0


def test_deterministic_across_parallelism(spark):
    docs = _docs(spark)
    a = pack_bins_ffd(docs, F.col("n_est"), CAP, num_groups=4)
    b = pack_bins_ffd(
        docs.repartition(17), F.col("n_est"), CAP, num_groups=4
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_waste_beats_naive_next_fit(spark):
    docs = _docs(spark).filter(F.col("n_est") <= CAP)
    ffd = pack_bins_ffd(docs, F.col("n_est"), CAP, num_groups=2)
    stats = bin_stats(ffd, CAP).collect()[0]
    assert stats["waste"] == CAP * stats["n_bins"] - stats["total_tokens"]
    # naive next-fit in doc_id order: close the bin when the next doc
    # doesn't fit (the zero-thought baseline a sequential writer uses)
    rows = docs.orderBy("doc_id").collect()
    fill, naive_bins = 0, 1
    for r in rows:
        if fill + r["n_est"] > CAP:
            naive_bins += 1
            fill = 0
        fill += r["n_est"]
    assert stats["n_bins"] <= naive_bins
    assert stats["fill_rate"] >= 0.9, stats


def test_tokens_conserved(spark):
    docs = _docs(spark)
    ffd = pack_bins_ffd(docs, F.col("n_est"), CAP, num_groups=4)
    assert (
        ffd.agg(F.sum("n_tokens")).collect()[0][0]
        == docs.agg(F.sum(F.greatest(F.col("n_est"), F.lit(1)))).collect()[0][0]
    )


def test_string_ids_and_sign_disjoint_bins(spark):
    """url-keyed corpora (curate output) pack directly: string ids
    flow through, and oversize bins are strictly negative — disjoint
    from every normal (group<<40)+local bin id by sign."""
    rows = [("https://a/1", 600), ("https://a/2", 100), ("https://a/3", 90)]
    df = spark.createDataFrame(rows, "url string, n long")
    out = pack_bins_ffd(df, F.col("n"), 512, id_col="url", num_groups=2)
    got = {r["url"]: r for r in out.collect()}
    assert got["https://a/1"]["oversize"]
    assert got["https://a/1"]["bin"] < 0
    assert not got["https://a/2"]["oversize"]
    assert got["https://a/2"]["bin"] >= 0 and got["https://a/3"]["bin"] >= 0
