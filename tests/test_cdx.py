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
    # FQDN trailing dot strips; the scheme's default port drops while
    # a non-default port survives both
    ("http://example.com./a", "com,example)/a"),
    ("http://example.com.:80/x", "com,example)/x"),
    ("https://example.com:443/x", "com,example)/x"),
    ("https://example.com.:8443/", "com,example:8443)/"),
    ("http://example.com:443/x", "com,example:443)/x"),  # not http's default
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


def test_cdx_manifest_matches_written_shards(spark, crawl, tmp_path):
    """write_cdx returns the cluster.idx manifest derived from the
    files it wrote (not a re-execution of the lazy plan): totals,
    global sortedness, and per-shard first keys must agree with a
    direct read-back of the index."""
    path = str(tmp_path / "cdx")
    manifest = cdx.write_cdx(cdx.build_cdx(crawl, npartitions=4), path)
    assert sum(n for _, n in manifest) == 200
    keys = [k for k, _ in manifest]
    assert keys == sorted(keys)
    readback = cdx.cdx_manifest(spark, path)
    assert readback == manifest
    assert keys[0] == (
        spark.read.parquet(path).agg(F.min("surt")).first()[0]
    )


def test_cdx_domain_lookup_covers_subdomains(spark, tmp_path):
    pages = spark.createDataFrame(
        [
            ("https://example.com/a", "20240101000000", bytearray(b"1")),
            ("https://www.example.com/b", "20240101000000", bytearray(b"2")),
            ("https://sub.example.com/c", "20240101000000", bytearray(b"3")),
            ("https://a.b.example.com/d", "20240101000000", bytearray(b"4")),
            ("https://exampleother.com/e", "20240101000000", bytearray(b"5")),
            ("https://example.com.evil.net/f", "20240101000000", bytearray(b"6")),
        ],
        "url string, warc_ts string, html binary",
    )
    path = str(tmp_path / "cdx")
    cdx.write_cdx(cdx.build_cdx(pages, npartitions=2), path)
    got = sorted(
        r["url"] for r in cdx.cdx_domain_lookup(spark, path, "example.com").collect()
    )
    assert got == [
        "https://a.b.example.com/d",
        "https://example.com/a",
        "https://sub.example.com/c",
        "https://www.example.com/b",  # www-stripped key = exact host
    ]
    # plain cdx_lookup on the host prefix misses subdomains by design
    exact = sorted(
        r["url"]
        for r in cdx.cdx_lookup(spark, path, "com,example)").collect()
    )
    assert exact == ["https://example.com/a", "https://www.example.com/b"]
    # www-form queries normalize to the same key space
    got_www = sorted(
        r["url"]
        for r in cdx.cdx_domain_lookup(spark, path, "www.example.com").collect()
    )
    assert got_www == got


def test_build_cdx_drops_unkeyable_urls(spark):
    pages = spark.createDataFrame(
        [("not-a-url", "20240101000000", bytearray(b"x")),
         ("https://ok.example.com/", "20240101000000", bytearray(b"y"))],
        "url string, warc_ts string, html binary",
    )
    out = cdx.build_cdx(pages, npartitions=2).collect()
    assert [r["url"] for r in out] == ["https://ok.example.com/"]


# ------------------------- serveable index: offsets + random access
# write_wet → read_warc_captures → build_cdx(carry) → cdx_lookup →
# fetch_capture: the full archive serving loop, byte-identical.


def test_located_parse_plain_and_gzip_ranges():
    from nidaba_spark.sources.rawfiles import (
        parse_warc_records_located,
        wet_record_bytes,
    )
    import gzip

    recs = [
        wet_record_bytes(f"https://ex.org/{i}", "2024-01-01T00:00:00Z", f"t{i}")
        for i in range(3)
    ]
    plain = b"".join(recs)
    got = list(parse_warc_records_located(plain))
    assert [g[0]["warc-target-uri"] for g in got] == [
        f"https://ex.org/{i}" for i in range(3)
    ]
    # each located range re-parses standalone to the same record
    for (h, p, off, ln), raw in zip(got, recs):
        assert plain[off:off + ln] == raw
    members = b"".join(
        gzip.compress(r, mtime=0) for r in recs
    )
    gotz = list(parse_warc_records_located(members))
    for (h, p, off, ln), (hp, pp, _, _) in zip(gotz, got):
        assert h == hp and p == pp
        blob = members[off:off + ln]
        assert blob[:2] == b"\x1f\x8b"
        assert gzip.decompress(blob) in plain


def test_cdx_serving_loop_byte_identical(spark, tmp_path):
    from nidaba_spark.sources.rawfiles import (
        fetch_capture,
        read_warc_captures,
        write_wet,
    )

    docs = spark.createDataFrame(
        [
            (f"https://site{i % 5}.example.com/p/{i}",
             f"2024-02-0{1 + i % 9} 00:00:0{i % 6}",
             f"capture body {i} é\nline two {i}")
            for i in range(40)
        ],
        "url string, ts string, text string",
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "text")
    wet = str(tmp_path / "wet")
    write_wet(docs, wet, num_segments=3)

    caps = read_warc_captures(spark, wet, glob="*.warc.wet.gz").select(
        "url", "warc_ts", "text", "warc_file",
        "offset", F.col("length").alias("warc_len"),
    )
    built = cdx.build_cdx(
        caps, payload_col="text", npartitions=4,
        carry=("warc_file", "offset", "warc_len"),
    )
    path = str(tmp_path / "cdx")
    cdx.write_cdx(built, path)

    # lookup one site's captures, then range-fetch each and compare
    hits = cdx.cdx_lookup(spark, path, "com,example,site3)").collect()
    assert len(hits) == 8  # i % 5 == 3
    exp = {r["url"]: r["text"] for r in docs.collect()}
    for h in hits:
        headers, payload = fetch_capture(
            spark, h["warc_file"], h["offset"], h["warc_len"]
        )
        assert headers["warc-target-uri"] == h["url"]
        assert payload.decode("utf-8") == exp[h["url"]]
