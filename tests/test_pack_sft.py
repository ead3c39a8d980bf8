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
