"""End-to-end dress rehearsal (jobs/full_corpus_job.py): WARC segments
→ checkpointed extraction → full curation stack → serving indexes, in
one job — the composition VERDICT r04 next #6 asks to prove. Small
fixture here; the 1M-page numbers are recorded in NOTES.md r05."""

from __future__ import annotations

import gzip
import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark import corpus  # noqa: E402

N = 120


def _warc_record(rtype: str, uri: str, date: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body


def test_full_corpus_job_end_to_end(spark, tmp_path, monkeypatch):
    import importlib
    import sys as _sys

    rows = corpus.generate_rows(N)
    # plant a multimodal candidate on every page (the synthetic corpus
    # carries no <img>): exercises the --images-out phase
    for r in rows:
        if r["html"]:
            r["html"] = (
                b'<img src="/pic.jpg" alt="a planted test caption">' + r["html"]
            )
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    # two CC-style member-gzip segments
    for si, chunk in enumerate((rows[: N // 2], rows[N // 2:])):
        data = b"".join(
            gzip.compress(
                _warc_record(
                    "response", r["url"], "2026-01-02T03:04:05Z", _http(r["html"])
                )
            )
            for r in chunk
        )
        (seg_dir / f"seg{si}.warc.gz").write_bytes(data)

    workdir = str(tmp_path / "run")
    # robots politeness gate: one host disallows everything
    robots_path = str(tmp_path / "robots.parquet")
    spark.createDataFrame(
        [("site3.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    ).write.parquet(robots_path)
    wet_out = str(tmp_path / "wet")
    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    job = importlib.import_module("full_corpus_job")
    monkeypatch.setattr(_sys, "argv", [
        "full_corpus_job.py", "--input", str(seg_dir), "--workdir", workdir,
        "--npartitions", "8", "--buckets", "8", "--eval-residue", "13",
        "--max-docs-per-host", "50", "--min-quality", "0.2",
        "--min-model-score", "0.05", "--robots", robots_path,
        "--wet-out", wet_out, "--wet-segments", "2",
        "--wat-out", str(tmp_path / "wat"), "--wat-segments", "2",
        "--images-out", str(tmp_path / "images"),
    ])
    job.main()

    metrics = json.load(open(os.path.join(workdir, "rehearsal_metrics.json")))
    assert set(metrics["phases"]) == {
        "extract", "curate", "linkgraph", "index", "wet_export",
        "cdx_index", "wat_export", "images_export",
    }
    assert metrics["extracted_rows"] == N
    assert 0 < metrics["curated_rows"] <= N
    assert metrics["lineage_rows"] > 0
    assert all(p["shuffle_write_bytes"] > 0 for p in metrics["phases"].values())

    # link-graph phase: edges written; authority sums to 1 when present
    edges = spark.read.parquet(os.path.join(workdir, "indexes", "linkgraph", "edges"))
    assert edges.count() == metrics["host_edges"]
    if metrics["host_edges"]:
        ranks = spark.read.parquet(
            os.path.join(workdir, "indexes", "linkgraph", "authority")
        ).collect()
        assert abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-6

    # curated table: packed schema + split column, packing invariant
    curated = spark.read.parquet(os.path.join(workdir, "curated"))
    assert set(curated.columns) == {
        "url", "n_tokens", "tokens_before", "pack_id", "pack_pos",
        "quality", "text", "split",
    }
    got = sorted(curated.collect(), key=lambda r: r["url"])
    acc = 0
    for r in got:
        assert r["tokens_before"] == acc
        acc += r["n_tokens"]
    assert {r["split"] for r in got} <= {"train", "val", "test"}

    # bloom decontamination (fpp=1e-9 ~= exact) removed every doc
    # sharing a 5-gram with the planted eval residue class — the eval
    # docs themselves are their own strongest contamination
    surviving_eval = curated.filter(
        F.pmod(F.xxhash64("url"), F.lit(13)) == 0
    ).count()
    assert surviving_eval == 0

    # robots gate honored through the composition: the disallowed
    # host never reaches the curated table
    assert not any("site3.example" in r["url"] for r in got)

    # multimodal candidates: one planted pair per SURVIVING page, the
    # src resolved absolute against the page url, caption carried
    images = spark.read.parquet(str(tmp_path / "images"))
    assert metrics["image_pairs"] == images.count() > 0
    curated_urls = {r["url"] for r in got}
    img_rows = images.collect()
    assert {r["url"] for r in img_rows} <= curated_urls
    assert all(r["caption"] == "a planted test caption" for r in img_rows)
    assert all(r["img_url"].endswith("/pic.jpg") and "://" in r["img_url"]
               for r in img_rows)

    # WET export round-trips the curated texts byte-identically
    from nidaba_spark.sources.rawfiles import read_warc_pages

    wet_back = read_warc_pages(spark, wet_out, glob="*.warc.wet.gz")
    assert metrics["wet_records"] == metrics["curated_rows"]
    got_wet = {r["url"]: r["text"] for r in wet_back.collect()}
    assert got_wet == {r["url"]: r["text"] for r in got}

    # CDX phase: the exported segments ship with a serveable index —
    # look one url up by SURT prefix and range-fetch its capture
    from nidaba_spark.operators.cdx import cdx_lookup, surt_key
    from nidaba_spark.sources.rawfiles import fetch_capture

    assert metrics["cdx_captures"] == metrics["curated_rows"]
    probe_url = got[0]["url"]
    probe_key = spark.range(1).select(
        surt_key(F.lit(probe_url)).alias("k")
    ).first()["k"]
    cap = cdx_lookup(
        spark, os.path.join(workdir, "indexes", "cdx"), probe_key
    ).collect()
    assert [c["url"] for c in cap] == [probe_url]
    _, payload = fetch_capture(
        spark, cap[0]["warc_file"], cap[0]["offset"], cap[0]["warc_len"]
    )
    assert payload.decode("utf-8") == got[0]["text"]

    # WAT export: one metadata record per RAW page (pre-curation —
    # the link graph wants blocked/duplicate pages' outlinks too),
    # envelope link sets matching the page_links operator view
    import json as _json

    from nidaba_spark.operators.links import page_links
    from nidaba_spark.sources.rawfiles import (
        parse_warc_records,
        read_warc_pages as _rwp,
    )

    assert metrics["wat_records"] == N
    wat_urls, wat_links = set(), {}
    for f in sorted((tmp_path / "wat").glob("*.warc.wat.gz")):
        for h, p in parse_warc_records(f.read_bytes()):
            if h.get("warc-type") != "metadata":
                continue
            wat_urls.add(h["warc-target-uri"])
            hm = _json.loads(p)["Envelope"]["Payload-Metadata"][
                "HTTP-Response-Metadata"]["HTML-Metadata"]
            wat_links[h["warc-target-uri"]] = sorted(
                x["url"] for x in hm["Links"]
            )
    assert wat_urls == {r["url"] for r in rows}
    # the WET↔WAT cross-reference is real in THIS job too: for every
    # curated url, the WAT record's WARC-Refers-To is the WET record's
    # WARC-Record-ID (both derive from the same real capture ts —
    # review r05 caught the epoch-vs-real mismatch)
    wet_ids, wat_refs = {}, {}
    import glob as _glob
    for f in sorted(_glob.glob(os.path.join(wet_out, "*.gz"))):
        for h, _ in parse_warc_records(open(f, "rb").read()):
            if h.get("warc-type") == "conversion":
                wet_ids[h["warc-target-uri"]] = h["warc-record-id"]
    for f in sorted((tmp_path / "wat").glob("*.warc.wat.gz")):
        for h, _ in parse_warc_records(f.read_bytes()):
            if h.get("warc-type") == "metadata":
                wat_refs[h["warc-target-uri"]] = h["warc-refers-to"]
    assert wet_ids and all(
        wat_refs[u] == rid for u, rid in wet_ids.items()
    )
    ingested = _rwp(spark, str(seg_dir))
    expect_links = {}
    for r in page_links(ingested).collect():
        expect_links.setdefault(r["src"], []).append(r["dst"])
    for u, ls in expect_links.items():
        assert wat_links[u] == sorted(ls)

    # serving indexes are queryable
    from nidaba_spark.operators.search import bm25_topk_postings
    from nidaba_spark.operators.sketches import union_hll

    hits = bm25_topk_postings(
        spark, os.path.join(workdir, "indexes", "bm25"), ["data"], k=3
    ).collect()
    assert hits and hits[0]["score"] >= hits[-1]["score"]
    lsh = spark.read.parquet(os.path.join(workdir, "indexes", "lsh"))
    assert lsh.count() == metrics["curated_rows"] * 16  # docs x bands
    assert union_hll(spark.read.parquet(os.path.join(workdir, "indexes", "hll"))) > 0

    # resumability: a second run with the same workdir reuses the
    # extraction checkpoints (manifest resume) and converges
    job.main()
    again = spark.read.parquet(os.path.join(workdir, "curated"))
    assert sorted(tuple(r) for r in again.collect()) == sorted(
        tuple(r) for r in got
    )
