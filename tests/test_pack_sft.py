"""jobs/pack_sft.py: curated parquet → packed SFT shards, both modes
end-to-end through build() (the spark-submit main's core), writing
and re-reading parquet.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.pack_sft import build  # noqa: E402


def _curated(spark, path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (
        docs.select(
            F.concat(F.lit("https://ex.com/"), F.col("doc_id")).alias("url"),
            (F.col("n_chars") / 4).cast("long").alias("n_tokens"),
            "text",
        ).write.mode("overwrite").parquet(path)
    )


def _args(**kw):
    base = dict(
        input=None, out=None, mode="ffd", capacity=512, id_col="url",
        token_col="n_tokens", text_col="text", num_groups=4, nlist=4,
        dim=16,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_ffd_mode_end_to_end(spark, tmp_path):
    src = str(tmp_path / "curated")
    out_path = str(tmp_path / "packs")
    _curated(spark, src)
    out, stats = build(spark, _args(input=src, out=out_path))
    out.write.mode("overwrite").parquet(out_path)
    back = spark.read.parquet(out_path)
    n = spark.read.parquet(src).count()
    assert back.count() == n
    assert back.select("url").distinct().count() == n
    over = (
        back.filter(~F.col("oversize"))
        .groupBy("bin")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > 512)
        .count()
    )
    assert over == 0
    assert stats["n_bins"] > 0 and stats["fill_rate"] >= 0.9


def test_iclm_mode_string_ids_end_to_end(spark, tmp_path):
    """The semantic mode over a text-only url-keyed corpus — hashed-TF
    vectors are minted on the fly; string ids must survive the whole
    ordering/packing path (no numeric-id assumption anywhere)."""
    src = str(tmp_path / "curated2")
    out_path = str(tmp_path / "packs2")
    _curated(spark, src)
    out, stats = build(
        spark, _args(input=src, out=out_path, mode="iclm", capacity=2000)
    )
    out.write.mode("overwrite").parquet(out_path)
    back = spark.read.parquet(out_path)
    n = spark.read.parquet(src).count()
    assert back.count() == n
    assert back.select("url").distinct().count() == n
    assert stats["n_packs"] > 1
    # same-cell contiguity survived the job composition
    rows = sorted(back.collect(), key=lambda r: r["tokens_before"])
    seen, prev = set(), None
    for r in rows:
        if r["cell"] != prev:
            assert r["cell"] not in seen
            seen.add(r["cell"])
            prev = r["cell"]


def test_iclm_on_real_curate_schema(spark, tmp_path):
    # the curated parquet carries curate()'s OWN packing columns
    # (tokens_before/pack_id/pack_pos) — joining this job's fresh
    # assignment used to leave duplicate pack_id/pack_pos columns and
    # crash with AMBIGUOUS_REFERENCE on the documented input shape
    src = str(tmp_path / "curated_full")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (
        docs.select(
            F.concat(F.lit("https://ex.com/"), F.col("doc_id")).alias("url"),
            (F.col("n_chars") / 4).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("tokens_before"),
            F.lit(0).cast("long").alias("pack_id"),
            F.lit(0).cast("long").alias("pack_pos"),
            F.lit(0.5).alias("quality"),
            "text",
        ).write.mode("overwrite").parquet(src)
    )
    out, stats = build(spark, _args(input=src, mode="iclm"))
    got = out.limit(5).collect()
    assert got and stats["n_packs"] > 0
    # exactly ONE pack_id/pack_pos survive (the fresh assignment)
    assert out.columns.count("pack_id") == 1
    assert out.columns.count("pack_pos") == 1


def test_iclm_derives_dim_from_embedding_column(spark, tmp_path):
    # a pre-embedded corpus whose vector width differs from --dim's
    # default must pack by the DATA's dimension, not crash in the
    # k-means pandas UDF
    src = str(tmp_path / "embedded")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (
        docs.select(
            F.concat(F.lit("https://ex.com/"), F.col("doc_id")).alias("url"),
            (F.col("n_chars") / 4).cast("long").alias("n_tokens"),
            "text",
            F.array(
                *[
                    (F.col("doc_id") % (i + 3)).cast("float")
                    for i in range(24)  # 24 != the _args default dim 16
                ]
            ).alias("embedding"),
        ).write.mode("overwrite").parquet(src)
    )
    out, stats = build(spark, _args(input=src, mode="iclm"))
    assert out.limit(3).collect() and stats["n_packs"] > 0
