"""CDX capture index (operators/cdx): SURT key semantics pinned on
hand-built URLs, the one-exchange global-sort plan shape, shard
sortedness/disjointness of the written index, StartsWith pushdown on
lookup, and cross-partitioning determinism."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators import cdx  # noqa: E402

SURT_CASES = [
    # (url, expected surt key)
    ("https://www.Example.COM/a?b=2&a=1", "com,example)/a?a=1&b=2"),
    ("HTTP://Example.com", "com,example)/"),
    ("http://example.com/#frag", "com,example)/"),
    ("https://sub.example.com:8443/P/Q?z=", "com,example,sub:8443)/p/q?z="),
    ("http://user:pw@example.com/x", "com,example)/x"),
    ("http://example.com/a?b=2&a=1&", "com,example)/a?a=1&b=2"),
    ("http://www.www2.example.com/", "com,example,www2)/"),  # one www strip
    ("ftp://example.org/pub", "org,example)/pub"),
    ("/relative/path", None),
    ("", None),
]


def test_surt_key_pinned(spark):
    df = spark.createDataFrame([(u,) for u, _ in SURT_CASES], "url string")
    got = [
        r["k"]
        for r in df.select(cdx.surt_key(F.col("url")).alias("k")).collect()
    ]
    assert got == [k for _, k in SURT_CASES]


@pytest.fixture(scope="module")
def crawl(spark):
    return spark.range(200).select(
        F.concat(
            F.lit("https://site"),
            (F.col("id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("2024010112"), F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
            F.lit("00"),
        ).alias("warc_ts"),
        F.encode(F.concat(F.lit("body "), F.col("id").cast("string")), "UTF-8").alias(
            "html"
        ),
    )


def test_build_cdx_one_exchange(crawl):
    df = cdx.build_cdx(crawl, npartitions=8)
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert explained.lower().count("exchange") == 1
    assert "rangepartitioning" in explained.lower()


def test_cdx_written_shards_sorted_and_disjoint(spark, crawl, tmp_path):
    path = str(tmp_path / "cdx")
    cdx.write_cdx(cdx.build_cdx(crawl, npartitions=4), path)
    rows = (
        spark.read.parquet(path)
        .select("surt", "ts", F.input_file_name().alias("f"))
        .collect()
    )
    by_file: dict[str, list[tuple[str, str]]] = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append((r["surt"], r["ts"]))
    # parquet preserves write order within a file: each shard sorted
    ranges = []
    for keys in by_file.values():
        assert keys == sorted(keys)
        ranges.append((keys[0], keys[-1]))
    # shard key ranges are pairwise disjoint -> the index is GLOBALLY
    # sorted across files (the cdx-NNNNN shard property)
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_cdx_lookup_prefix_and_pushdown(spark, crawl, tmp_path):
    path = str(tmp_path / "cdx")
    cdx.write_cdx(cdx.build_cdx(crawl, npartitions=4), path)
    hits = cdx.cdx_lookup(spark, path, "com,example,site3)")
    urls = sorted(r["url"] for r in hits.collect())
    assert urls == sorted(
        f"https://site3.example.com/p/{i}" for i in range(200) if i % 7 == 3
    )
    scan = hits._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith(surt,com,example,site3))" in scan.replace(
        "StartsWith(surt, ", "StartsWith(surt,"
    )


def test_cdx_cross_partitioning_determinism(crawl):
    a = sorted(map(tuple, cdx.build_cdx(crawl, npartitions=2).collect()))
    b = sorted(map(tuple, cdx.build_cdx(crawl, npartitions=8).collect()))
    assert a == b


def test_cdx_cluster_index(crawl):
    built = cdx.build_cdx(crawl, npartitions=4)
    idx = cdx.cdx_cluster_index(built)
    assert sum(n for _, n in idx) == 200
    nonempty = [k for k, n in idx if n > 0]
    assert nonempty == sorted(nonempty)
    assert min(k for k, n in idx if n > 0) == built.agg(F.min("surt")).first()[0]


def test_build_cdx_drops_unkeyable_urls(spark):
    pages = spark.createDataFrame(
        [("not-a-url", "20240101000000", bytearray(b"x")),
         ("https://ok.example.com/", "20240101000000", bytearray(b"y"))],
        "url string, warc_ts string, html binary",
    )
    out = cdx.build_cdx(pages, npartitions=2).collect()
    assert [r["url"] for r in out] == ["https://ok.example.com/"]
