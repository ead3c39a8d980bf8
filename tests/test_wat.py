"""WAT metadata egress: page_wat envelope correctness vs the
operator views it mirrors (page_links / anchor_texts / page_meta),
write_wat byte-determinism, WET↔WAT segment pairing and record
cross-referencing."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators.links import (
    anchor_texts,
    page_links,
    page_meta,
    page_wat,
)
from nidaba_spark.sources.rawfiles import (
    parse_warc_records,
    write_wat,
    write_wet,
)


def _mk_pages(spark, n=23):
    rows = []
    for i in range(n):
        body = "".join(
            f'<a href="/p{j}">to page {j}</a> <a href=\'rel/{j}\'>r</a>'
            for j in range(i % 4)
        )
        head = f"<title> Page  {i} </title>"
        if i % 3 == 0:
            head += '<meta name="robots" content="noindex">'
        if i % 5 == 0:
            head += '<link rel="canonical" href="/canon">'
        html = f"<html><head>{head}</head><body>{body}é{i}</body></html>"
        rows.append(
            (
                f"https://site{i % 7}.example/d/{i}",
                f"2024-03-0{1 + i % 9} 0{i % 10}:15:0{i % 6}",
                bytearray(html.encode("utf-8")),
            )
        )
    return spark.createDataFrame(
        rows, "url string, ts string, html binary"
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "html")


def _read_wat_records(out_dir):
    """url -> (headers, envelope json) across every segment file."""
    got = {}
    for f in sorted(glob.glob(os.path.join(out_dir, "*.warc.wat*"))):
        data = open(f, "rb").read()
        assert data[:2] == b"\x1f\x8b"  # per-record gzip members
        for h, payload in parse_warc_records(data):
            if h.get("warc-type") != "metadata":
                assert h.get("warc-type") == "warcinfo"
                continue
            assert h.get("content-type") == "application/json"
            got[h["warc-target-uri"]] = (h, json.loads(payload))
    return got


def test_wat_envelope_matches_operator_views(spark, tmp_path):
    pages = _mk_pages(spark)
    out = str(tmp_path / "wat")
    manifest = write_wat(pages, out, num_segments=3)
    assert sum(r["n_records"] for r in manifest.collect()) == 23
    got = _read_wat_records(out)
    assert len(got) == 23

    links = {}
    for r in page_links(pages).collect():
        links.setdefault(r["src"], []).append(r["dst"])
    anchors = {}
    for r in anchor_texts(pages).collect():
        anchors.setdefault(r["src"], []).append((r["dst"], r["anchor"]))
    meta = {r["url"]: r for r in page_meta(pages).collect()}

    for url, (h, env) in got.items():
        e = env["Envelope"]
        assert e["WARC-Header-Metadata"]["WARC-Target-URI"] == url
        assert e["WARC-Header-Metadata"]["WARC-Date"] == h["warc-date"]
        hm = e["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
        # link multiset ignores order (page_links explodes dq+sq in a
        # different interleaving than the array concat); anchor view
        # is order-preserving within the page
        assert sorted(x["url"] for x in hm["Links"]) == sorted(
            links.get(url, [])
        )
        assert [(a["url"], a["text"]) for a in hm["Anchors"]] == anchors.get(
            url, []
        )
        m = meta[url]
        assert hm["Head"]["Title"] == m["title"]
        if m["robots"]:
            assert hm["Head"]["Metas"] == [
                {"name": "robots", "content": m["robots"]}
            ]
        else:
            assert "Metas" not in hm["Head"]
        if m["canonical"] is not None:
            assert hm["Head"]["Link"] == [
                {"rel": "canonical", "url": m["canonical"]}
            ]
        else:
            assert "Link" not in hm["Head"]


def test_wat_byte_determinism_across_partitioning(spark, tmp_path):
    pages = _mk_pages(spark)
    m1 = write_wat(pages.repartition(8), str(tmp_path / "a"), num_segments=3)
    m2 = write_wat(pages.repartition(1), str(tmp_path / "b"), num_segments=3)
    s1 = {r["segment"]: r["sha256"] for r in m1.collect()}
    s2 = {r["segment"]: r["sha256"] for r in m2.collect()}
    assert s1 == s2 and len(s1) >= 2


def test_wat_pairs_with_wet_segments_and_records(spark, tmp_path):
    """Same md5-uniform permutation: page P lands in wat-N exactly
    when its text landed in wet-N, and the WAT record's
    WARC-Refers-To IS the WET record's WARC-Record-ID."""
    pages = _mk_pages(spark)
    docs = pages.select(
        "url", "warc_ts", F.lit("extracted text").alias("text")
    )
    wat_dir, wet_dir = str(tmp_path / "wat"), str(tmp_path / "wet")
    write_wat(pages, wat_dir, num_segments=4)
    write_wet(docs, wet_dir, num_segments=4)

    def seg_map(d, rtype):
        out = {}
        for f in sorted(glob.glob(os.path.join(d, "*.gz"))):
            seg = int(os.path.basename(f).split("-")[1].split(".")[0])
            for h, _ in parse_warc_records(open(f, "rb").read()):
                if h.get("warc-type") == rtype:
                    out[h["warc-target-uri"]] = (seg, h)
        return out

    wat = seg_map(wat_dir, "metadata")
    wet = seg_map(wet_dir, "conversion")
    assert wat.keys() == wet.keys()
    for url in wat:
        assert wat[url][0] == wet[url][0]  # paired segment number
        assert wat[url][1]["warc-refers-to"] == wet[url][1]["warc-record-id"]


def test_wet_writer_unchanged_by_refactor(spark, tmp_path):
    """The shared _write_warc_segments refactor must not move WET
    bytes: pin a small corpus's segment sha256s against the
    pre-refactor golden values (computed with the original write_wet
    on this corpus)."""
    docs = spark.createDataFrame(
        [
            (f"https://g{i}.example/p", "2024-01-02 03:04:05", f"text {i}")
            for i in range(6)
        ],
        "url string, ts string, text string",
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "text")
    m = write_wet(docs, str(tmp_path / "wet"), num_segments=2)
    got = {r["segment"]: (r["n_records"], r["sha256"]) for r in m.collect()}
    # goldens computed with the ORIGINAL (pre-_write_warc_segments)
    # write_wet on this exact corpus; any drift is a WET-format break
    assert got == {
        0: (4, "e76194b3c841ba96e5b3db46e1c4ed815337fa9524f37148ccd88b8590cd8558"),
        1: (2, "929825e15e35b395439a8a53ace72af46381cb7ec55248c3582c6d62d96b3ca0"),
    }
