"""Raw binaryFile ingest (B3) + foreachBatch upsert sink (B50)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nidaba_spark import corpus, oracle, pipeline
from nidaba_spark.sources.rawfiles import read_raw_pages


def test_binaryfile_ingest_through_pipeline(spark, tmp_path):
    raw_dir = tmp_path / "drop"
    raw_dir.mkdir()
    rows = [corpus.make_row(k) for k in range(40)]
    for i, r in enumerate(rows):
        with open(raw_dir / f"page{i}.html", "wb") as f:
            f.write(r["html"] or b"")
    pages = read_raw_pages(spark, str(raw_dir))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {
        os.path.basename(r["url"]): r["text"]
        for r in pipeline.extract(pages).collect()
    }
    # the binaryFile source skips zero-byte files (k=4 is the 'zero'
    # corpus variant) — acceptable: an empty drop carries no content
    n_nonempty = sum(1 for r in rows if r["html"])
    assert len(got) == n_nonempty == 39
    for i, r in enumerate(rows):
        if not r["html"]:
            continue
        # crawler text column is null for raw drops -> no fallback text
        exp, _ = oracle.extract(r["html"], None)
        assert got[f"page{i}.html"] == exp, i


def test_foreach_batch_upsert(spark, tmp_path):
    from nidaba_spark.sources.tables import load
    from nidaba_spark.streaming.events import foreach_batch_upsert

    sf = "/root/testdata/sf0.001"
    schema = load(spark, sf, "events").schema
    target = foreach_batch_upsert(
        spark, os.path.join(sf, "events.parquet"), schema, str(tmp_path)
    )
    out = spark.read.schema(schema).parquet(target)
    src = load(spark, sf, "events")
    assert out.count() == src.count()  # all unique ids, none lost
    assert out.select(F.countDistinct("event_id")).collect()[0][0] == src.count()
    # idempotent: re-running the catch-up must not duplicate anything
    target2 = foreach_batch_upsert(
        spark, os.path.join(sf, "events.parquet"), schema, str(tmp_path) + "_2"
    )
    assert spark.read.schema(schema).parquet(target2).count() == src.count()


def test_stream_lineage_rows(spark, tmp_path):
    """VERDICT r03 next #8: stream ingest writes per-micro-batch
    lineage rows through the same _lineage schema the batch Pipeline
    uses, so one lineage() read covers batch stages and stream
    batches."""
    from nidaba_spark import schemas
    from nidaba_spark.sources.tables import load
    from nidaba_spark.streaming.events import (
        foreach_batch_upsert,
        ingest_events_stream,
    )

    sf = "/root/testdata/sf0.001"
    schema = load(spark, sf, "events").schema
    lineage_dir = str(tmp_path / "_lineage")
    ingest_events_stream(
        spark,
        os.path.join(sf, "events.parquet"),
        schema,
        str(tmp_path / "ing"),
        lineage_dir=lineage_dir,
        run_id="run_s",
    )
    foreach_batch_upsert(
        spark,
        os.path.join(sf, "events.parquet"),
        schema,
        str(tmp_path / "fb"),
        lineage_dir=lineage_dir,
        run_id="run_s",
    )
    lin = spark.read.schema(schemas.LINEAGE).parquet(lineage_dir)
    by_stage: dict[str, list] = {}
    for r in lin.collect():
        by_stage.setdefault(r["stage"], []).append(r)
    n_events = load(spark, sf, "events").count()
    assert {"stream_ingest", "stream_upsert"} <= set(by_stage)
    for stage in ("stream_ingest", "stream_upsert"):
        rows = by_stage[stage]
        # one row per micro-batch (availableNow may log a trailing
        # zero-row finalization batch — real engine activity, kept)
        assert all(r["run_id"] == "run_s" and r["status"] == "ok" for r in rows)
        assert sum(r["input_rows"] for r in rows) == n_events
        assert all(r["finished"] >= r["started"] for r in rows)
        assert len({r["partition_id"] for r in rows}) == len(rows)  # batch ids unique


def _warc_record(rtype: str, uri: str, date: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body


def test_warc_parse_pure(tmp_path):
    from nidaba_spark.sources.rawfiles import parse_warc_records

    data = (
        _warc_record("warcinfo", "", "2026-01-01T00:00:00Z", b"software: test\r\n")
        + _warc_record(
            "response", "https://a.example/x", "2026-01-02T03:04:05Z",
            _http(b"<html><body>hello</body></html>"),
        )
        + _warc_record(
            "conversion", "https://b.example/y", "2026-01-03T00:00:00Z",
            "plain wet text é".encode(),
        )
    )
    recs = list(parse_warc_records(data))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "response", "conversion"]
    # per-record gzip (Common Crawl member framing) round-trips too
    import gzip

    members = b"".join(
        gzip.compress(_warc_record("response", f"https://g.example/{i}",
                                   "2026-01-04T00:00:00Z", _http(b"gz" + bytes([48 + i]))))
        for i in range(3)
    )
    recs = list(parse_warc_records(members))
    assert len(recs) == 3
    assert all(h["warc-type"] == "response" for h, _ in recs)


def test_warc_ingest_through_pipeline(spark, tmp_path):
    from nidaba_spark.sources.rawfiles import read_warc_pages

    rows = corpus.generate_rows(6)
    data = b"".join(
        _warc_record("response", r["url"], "2026-01-02T03:04:05Z", _http(r["html"]))
        for r in rows[:4]
    ) + _warc_record("warcinfo", "", "2026-01-01T00:00:00Z", b"x")
    wet = _warc_record(
        "conversion", "https://wet.example/1", "2026-01-05T00:00:00Z",
        b"crawler text only here"
    )
    (tmp_path / "drop1.warc").write_bytes(data)
    (tmp_path / "drop2.warc").write_bytes(wet)
    pages = read_warc_pages(spark, str(tmp_path))
    got = {r["url"]: r for r in pages.collect()}
    assert len(got) == 5  # warcinfo skipped
    for r in rows[:4]:
        assert bytes(got[r["url"]]["html"]) == r["html"]
    assert got["https://wet.example/1"]["text"] == "crawler text only here"
    assert bytes(got["https://wet.example/1"]["html"]) == b""
    # flows through the real extract pipeline; html bodies extract
    # byte-identically to the direct-parquet path
    ext = {r["url"]: r["text"] for r in pipeline.extract(pages, npartitions=4).collect()}
    for r in rows[:4]:
        # WARC response records carry no crawler text -> None fallback
        want, _ = oracle.extract(r["html"], None)
        assert ext[r["url"]] == want
    assert any(ext[r["url"]] for r in rows[:4])  # not vacuously empty


def test_warc_truncated_tail_drops_partial_record():
    from nidaba_spark.sources.rawfiles import parse_warc_records

    good = _warc_record("response", "https://ok.example/1",
                        "2026-01-02T03:04:05Z", _http(b"fine"))
    partial = _warc_record("response", "https://cut.example/2",
                           "2026-01-02T03:04:05Z", _http(b"x" * 100))
    for cut in (len(good) + 10, len(good) + len(partial) - 10):
        recs = list(parse_warc_records((good + partial)[:cut]))
        assert len(recs) == 1  # the complete record survives, partial dropped
        assert recs[0][0]["warc-target-uri"] == "https://ok.example/1"
    # a record whose payload is complete but whose CRLFCRLF terminator
    # was cut is still a full record — kept
    recs = list(parse_warc_records((good + partial)[: len(good) + len(partial) - 3]))
    assert len(recs) == 2


def test_warc_framing_fuzz():
    """Length-based framing must survive adversarial payloads —
    including bodies that CONTAIN 'WARC/1.0', CRLFCRLF, or gzip magic
    bytes. Serialize random records, parse, demand an exact
    round-trip of (type, uri, payload)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nidaba_spark.sources.rawfiles import parse_warc_records

    payloads = st.binary(min_size=0, max_size=200) | st.sampled_from([
        b"WARC/1.0\r\nfake: record\r\n\r\n",
        b"\r\n\r\n\r\n\r\n",
        b"\x1f\x8b not actually gzip",
        b"Content-Length: 99999\r\n\r\n",
    ])
    records = st.lists(
        st.tuples(
            st.sampled_from(["response", "conversion", "metadata"]),
            st.text(alphabet="abcXYZ09:/._-", min_size=1, max_size=40),
            payloads,
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=150, deadline=None)
    @given(records)
    def run(recs):
        blob = b"".join(
            _warc_record(t, u, "2026-01-01T00:00:00Z", p) for t, u, p in recs
        )
        parsed = [
            (h["warc-type"], h["warc-target-uri"], bytes(p))
            for h, p in parse_warc_records(blob)
        ]
        assert parsed == [(t, u, p) for t, u, p in recs]

    run()


def test_warc_gzip_truncated_trailing_member():
    import gzip

    from nidaba_spark.sources.rawfiles import parse_warc_records

    m1 = gzip.compress(_warc_record("response", "https://ok.example/1",
                                    "2026-01-01T00:00:00Z", _http(b"fine")))
    m2 = gzip.compress(_warc_record("response", "https://cut.example/2",
                                    "2026-01-01T00:00:00Z", _http(b"y" * 500)))
    recs = list(parse_warc_records(m1 + m2[: len(m2) // 2]))
    assert [h["warc-target-uri"] for h, _ in recs] == ["https://ok.example/1"]
    # trailing non-gzip garbage after a full member is ignored too
    recs = list(parse_warc_records(m1 + b"JUNKJUNK"))
    assert len(recs) == 1


def test_warc_gzip_many_members_chunked_ramp():
    """The member loop feeds decompressors in growing chunks off a
    memoryview (O(bytes), not O(bytes × members) — NOTES r05): exact
    offsets/lengths/payloads must survive for many tiny members, a
    member larger than the chunk ramp's cap, truncated tails, and
    corrupt tails."""
    import gzip

    from nidaba_spark.sources.rawfiles import (
        _gunzip_members,
        _iter_gzip_members,
        parse_warc_records_located,
    )

    recs = [
        _warc_record(
            "response", f"https://m.example/{i}",
            "2026-01-01T00:00:00Z", _http(b"b" * (i % 97)),
        )
        for i in range(300)
    ]
    big = _warc_record(
        "response", "https://m.example/big",
        "2026-01-01T00:00:00Z", _http(b"z" * (9 << 20)),
    )
    recs.insert(150, big)
    members = [gzip.compress(r, mtime=0) for r in recs]
    blob = b"".join(members)

    assert _gunzip_members(blob) == b"".join(recs)
    locs = list(_iter_gzip_members(blob))
    assert len(locs) == 301
    off = 0
    for (o, ln, raw), m, r in zip(locs, members, recs):
        assert (o, ln, raw) == (off, len(m), r)
        off += ln
    urls = [
        h["warc-target-uri"] for h, _, _, _ in parse_warc_records_located(blob)
    ]
    assert len(urls) == 301 and urls[150] == "https://m.example/big"
    # truncated tail: last member dropped, everything before intact
    assert len(list(_iter_gzip_members(blob[:-20]))) == 300
    # corrupt gzip tail: full members before it all parse
    assert len(list(_iter_gzip_members(blob + b"\x1f\x8b" + b"\x00" * 8))) == 301


def test_warc_mixed_and_malformed_dates(spark, tmp_path):
    from nidaba_spark.sources.rawfiles import read_warc_pages

    data = (
        _warc_record("response", "https://z.example/1", "2026-01-02T03:04:05Z",
                     _http(b"a"))
        + _warc_record("response", "https://off.example/2",
                       "2026-01-02T03:04:05+00:00", _http(b"b"))
        + _warc_record("response", "https://bad.example/3", "not-a-date",
                       _http(b"c"))
    )
    (tmp_path / "mix.warc").write_bytes(data)
    got = {r["url"]: r for r in read_warc_pages(spark, str(tmp_path)).collect()}
    assert len(got) == 3
    assert got["https://z.example/1"]["warc_ts"] == got["https://off.example/2"]["warc_ts"]
    assert got["https://bad.example/3"]["warc_ts"] is None  # coerced, not crashed


def test_http_meta_pure():
    from nidaba_spark.sources.rawfiles import _http_meta

    assert _http_meta(
        b"HTTP/1.1 301 Moved Permanently\r\nServer: x\r\n"
        b"Location: /new/place\r\nContent-Type: text/html; charset=UTF-8\r\n"
        b'ETag: "abc123"\r\nLast-Modified: Tue, 01 Jan 2026 00:00:00 GMT\r\n'
        b"\r\nredirect body"
    ) == (301, "text/html", "/new/place", '"abc123"',
          "Tue, 01 Jan 2026 00:00:00 GMT")
    # first occurrence of each header wins; media type lowercased
    assert _http_meta(
        b"HTTP/1.0 200 OK\r\nContent-Type: Application/PDF\r\n"
        b"Content-Type: text/plain\r\n\r\n%PDF"
    ) == (200, "application/pdf", None, None, None)
    # not HTTP-framed / garbage status token: nulls, never a raise
    assert _http_meta(b"<html>raw dump</html>") == (None,) * 5
    assert _http_meta(b"HTTP/1.1 banana\r\n\r\nx") == (None,) * 5
    # headers-only payload (no CRLFCRLF) still parses
    assert _http_meta(b"HTTP/1.1 204 No Content\r\nContent-Type: a/b") == (
        204, "a/b", None, None, None,
    )


def test_read_warc_responses(spark, tmp_path):
    from nidaba_spark.sources.rawfiles import read_warc_responses

    recs = (
        _warc_record(
            "response", "https://r.example/old", "2026-01-02T03:04:05Z",
            b"HTTP/1.1 301 Moved\r\nLocation: https://r.example/new\r\n\r\ngone",
        )
        + _warc_record(
            "response", "https://r.example/page", "2026-01-02T03:04:06Z",
            _http(b"<html>ok</html>"),
        )
        + _warc_record(
            "response", "https://r.example/raw", "2026-01-02T03:04:07Z",
            b"not http framed at all",
        )
        + _warc_record(  # non-response records skipped
            "metadata", "https://r.example/page", "2026-01-02T03:04:06Z",
            b"{}",
        )
    )
    (tmp_path / "r.warc").write_bytes(recs)
    got = {
        r["url"]: r for r in read_warc_responses(spark, str(tmp_path)).collect()
    }
    assert set(got) == {
        "https://r.example/old", "https://r.example/page",
        "https://r.example/raw",
    }
    old = got["https://r.example/old"]
    assert (old["status"], old["location"]) == (301, "https://r.example/new")
    assert bytes(old["html"]) == b"gone"
    page = got["https://r.example/page"]
    assert (page["status"], page["mime"], page["location"]) == (
        200, "text/html", None,
    )
    assert bytes(page["html"]) == b"<html>ok</html>"
    raw = got["https://r.example/raw"]
    assert raw["status"] is None and raw["mime"] is None
    assert bytes(raw["html"]) == b"not http framed at all"


def test_build_cdx_mime_col(spark):
    from nidaba_spark.operators.cdx import build_cdx

    df = spark.createDataFrame(
        [
            ("https://m.example/a", "20260101000000", b"x", "application/pdf"),
            ("https://m.example/b", "20260101000000", b"y", None),
        ],
        "url string, warc_ts string, html binary, mime_parsed string",
    )
    got = {
        r["url"]: r["mime"]
        for r in build_cdx(df, mime_col="mime_parsed").collect()
    }
    assert got == {
        "https://m.example/a": "application/pdf",
        "https://m.example/b": "text/html",  # null parse → literal default
    }


def test_wet_writer_roundtrip(spark, tmp_path):
    """write_wet → read_warc_pages round-trips (url, text) byte-
    identically and second-precision warc_ts; files are CC-shaped
    (warcinfo lead record, per-record gzip members)."""
    from nidaba_spark.sources.rawfiles import read_warc_pages, write_wet

    docs = spark.createDataFrame(
        [
            (f"https://ex{i}.org/p", f"2024-01-0{1 + i % 9} 0{i % 10}:30:0{i % 6}",
             f"text for page {i}\nwith a second line é{i}")
            for i in range(37)
        ]
        + [("https://exnull.org/p", "2024-01-01 00:00:00", None)],
        "url string, ts string, text string",
    ).select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "text"
    )
    out = str(tmp_path / "wet")
    manifest = write_wet(docs, out, num_segments=4)
    mrows = {r["segment"]: r for r in manifest.collect()}
    assert sum(r["n_records"] for r in mrows.values()) == 38
    for r in mrows.values():
        assert os.path.getsize(r["path"]) == r["n_bytes"]
        assert r["path"].endswith(".warc.wet.gz")

    back = read_warc_pages(spark, out, glob="*.warc.wet.gz")
    got = {r["url"]: r for r in back.collect()}
    exp = {r["url"]: r for r in docs.collect()}
    assert set(got) == set(exp)
    for url, e in exp.items():
        assert got[url]["text"] == (e["text"] or "")  # byte-identical payload
        assert got[url]["warc_ts"] == e["warc_ts"]  # second precision here
        assert got[url]["html"] == bytearray(b"")  # conversion records


def test_wet_writer_deterministic_bytes(spark, tmp_path):
    """Two runs over the same corpus (different upstream partitioning)
    produce byte-identical segment files — manifest sha256s equal."""
    from nidaba_spark.sources.rawfiles import write_wet

    rows = [
        (f"https://d{i}.org", "2024-02-02 12:00:00", f"doc {i} body")
        for i in range(25)
    ]
    docs = spark.createDataFrame(
        rows, "url string, ts string, text string"
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "text")
    m1 = write_wet(docs.repartition(8), str(tmp_path / "a"), num_segments=3)
    m2 = write_wet(docs.repartition(2), str(tmp_path / "b"), num_segments=3)
    s1 = {r["segment"]: r["sha256"] for r in m1.collect()}
    s2 = {r["segment"]: r["sha256"] for r in m2.collect()}
    assert s1 == s2 and len(s1) >= 2


def test_wet_writer_duplicate_url_determinism(spark, tmp_path):
    """Duplicate url values share a shard_pos (the permutation hashes
    url); ordering must fall back to the payload columns so bytes stay
    deterministic for un-deduped inputs (review r05)."""
    from nidaba_spark.sources.rawfiles import write_wet

    rows = [
        ("https://dup.org/p", "2024-02-02 12:00:00", f"version {v}")
        for v in range(6)
    ] + [("https://solo.org/q", "2024-02-02 12:00:00", "solo")]
    docs = spark.createDataFrame(
        rows, "url string, ts string, text string"
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "text")
    m1 = write_wet(docs.repartition(7), str(tmp_path / "a"), num_segments=2)
    m2 = write_wet(docs.repartition(1), str(tmp_path / "b"), num_segments=2)
    assert {r["segment"]: r["sha256"] for r in m1.collect()} == {
        r["segment"]: r["sha256"] for r in m2.collect()
    }


def test_wet_record_bytes_pure():
    """Record framing is parseable by the pure parser and the
    Content-Length counts UTF-8 payload bytes exactly."""
    from nidaba_spark.sources.rawfiles import parse_warc_records, wet_record_bytes

    rec = wet_record_bytes("https://x.org", "2024-01-01T00:00:00Z", "café")
    recs = list(parse_warc_records(rec))
    assert len(recs) == 1
    h, payload = recs[0]
    assert h["warc-type"] == "conversion"
    assert h["warc-target-uri"] == "https://x.org"
    assert int(h["content-length"]) == len("café".encode()) == 5
    assert payload.decode("utf-8") == "café"
    # deterministic: same inputs -> same bytes (record id included)
    assert rec == wet_record_bytes("https://x.org", "2024-01-01T00:00:00Z", "café")


def test_http_meta_bare_lf_headers():
    """Noncompliant servers emit bare-LF header lines and archives
    store them verbatim: the split must not half-parse (status found,
    Location lost) — review r05."""
    from nidaba_spark.sources.rawfiles import _http_body, _http_meta

    payload = b"HTTP/1.1 301 Moved\nLocation: /new\nContent-Type: a/b\n\nbody"
    assert _http_meta(payload) == (301, "a/b", "/new", None, None)
    assert _http_body(payload) == b"body"
    # non-HTTP payloads pass through whole even when they contain
    # blank lines
    raw = b"plain text\n\nwith a blank line"
    assert _http_meta(raw) == (None,) * 5
    assert _http_body(raw) == raw


def test_fetch_validators_latest_capture_wins(spark, tmp_path):
    """read_warc_responses surfaces ETag/Last-Modified;
    fetch_validators keeps each url's latest-capture validators — the
    conditional-GET state for cheap recrawls."""
    from nidaba_spark.operators.snapshot import fetch_validators
    from nidaba_spark.sources.rawfiles import read_warc_responses

    recs = (
        _warc_record(
            "response", "https://v.example/p", "2026-01-01T00:00:00Z",
            b'HTTP/1.1 200 OK\r\nETag: "old"\r\n'
            b"Last-Modified: Thu, 01 Jan 2026 00:00:00 GMT\r\n\r\nv1",
        )
        + _warc_record(
            "response", "https://v.example/p", "2026-02-01T00:00:00Z",
            b'HTTP/1.1 200 OK\r\nETag: "new"\r\n\r\nv2',
        )
        + _warc_record(
            "response", "https://v.example/q", "2026-01-15T00:00:00Z",
            b"HTTP/1.1 200 OK\r\n"
            b"Last-Modified: Fri, 02 Jan 2026 00:00:00 GMT\r\n\r\nq",
        )
    )
    (tmp_path / "v.warc").write_bytes(recs)
    resp = read_warc_responses(spark, str(tmp_path))
    got = {
        r["url"]: (r["etag"], r["last_modified"])
        for r in fetch_validators(resp).collect()
    }
    assert got == {
        # the later capture's validators win even though it lacks
        # Last-Modified — validators describe ONE capture, not a merge
        "https://v.example/p": ('"new"', None),
        "https://v.example/q": (None, "Fri, 02 Jan 2026 00:00:00 GMT"),
    }


def test_upsert_recovers_died_mid_swap(spark, tmp_path):
    # rename-aside crash consistency: if a previous upsert attempt
    # renamed target aside (.old) and died before installing the
    # replacement, the next batch must restore the history — the old
    # delete-then-rename protocol rebuilt the table from the current
    # batch alone, silently losing every previously upserted row.
    import shutil

    from nidaba_spark.sources.tables import load
    from nidaba_spark.streaming.events import foreach_batch_upsert

    sf = "/root/testdata/sf0.001"
    schema = load(spark, sf, "events").schema
    wd = str(tmp_path)
    target = foreach_batch_upsert(
        spark, os.path.join(sf, "events.parquet"), schema, wd
    )
    n = spark.read.schema(schema).parquet(target).count()
    assert n > 0
    # simulate the crash window: target moved aside, install never ran
    os.rename(target, target + ".old")
    # drop a fresh copy of the source so the resumed stream has a new
    # micro-batch to process (same ids -> pure upsert, no growth)
    redrop = os.path.join(wd, "src", "events_redrop.parquet")
    shutil.copy(os.path.join(sf, "events.parquet"), redrop)
    target2 = foreach_batch_upsert(spark, redrop, schema, wd)
    assert target2 == target
    # history fully recovered, no duplicates
    out = spark.read.schema(schema).parquet(target)
    assert out.count() == n
    assert not os.path.isdir(target + ".old")


def test_read_dir_ignores_uncommitted_temporary(spark, tmp_path):
    # a crash DURING the first index write leaves batch=0/_temporary
    # only; _read_dir must treat that as "no index yet" (None), not
    # fail schema inference on every checkpoint replay forever
    from nidaba_spark.streaming.dedup import _read_dir

    idx = tmp_path / "index"
    (idx / "batch=0" / "_temporary" / "0").mkdir(parents=True)
    (idx / "batch=0" / "_temporary" / "0" / "part-0.parquet").write_bytes(b"junk")
    assert _read_dir(spark, str(idx)) is None
    assert _read_dir(spark, str(tmp_path / "absent")) is None
    # once committed data exists the read proceeds
    spark.range(3).write.mode("overwrite").parquet(str(idx / "batch=1"))
    got = _read_dir(spark, str(idx))
    assert got is not None and got.count() == 3


def test_wet_writer_overwrite_cleans_stale_segments(spark, tmp_path):
    # re-exporting into the same dir with FEWER segments must not
    # leave the old run's higher-numbered segments (or a killed
    # attempt's tmp file) for the readers' globs to ingest
    from nidaba_spark.sources.rawfiles import read_warc_pages, write_wet

    docs = spark.createDataFrame(
        [(f"https://s{i}.org/p", f"t {i}") for i in range(20)],
        "url string, text string",
    ).select(
        "url",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "text",
    )
    out = str(tmp_path / "wet")
    write_wet(docs, out, num_segments=6)
    # simulate a killed attempt's leftover tmp (old, non-dotted form)
    open(os.path.join(out, "wet-00002.warc.wet.gz.inprogress.7"), "wb").write(
        b"torn"
    )
    write_wet(docs.limit(8), out, num_segments=2)
    names = sorted(os.listdir(out))
    assert names == ["wet-00000.warc.wet.gz", "wet-00001.warc.wet.gz"]
    assert read_warc_pages(spark, out, glob="*.warc.wet*").count() == 8


def test_located_parser_rejects_unaligned_members():
    # a MIDDLE gzip member starting mid-record = not member-aligned:
    # per-member offsets are meaningless and the old code silently
    # yielded nothing; a truncated LAST member stays tolerated
    import gzip

    import pytest as _pytest

    from nidaba_spark.sources.rawfiles import (
        parse_warc_records_located,
        wet_record_bytes,
    )

    rec = wet_record_bytes("https://a.org/x", "2024-01-01T00:00:00Z", "hello")
    good = gzip.compress(rec, 6, mtime=0)
    misaligned = gzip.compress(rec[10:], 6, mtime=0)  # starts mid-record
    with _pytest.raises(ValueError, match="member-aligned"):
        list(parse_warc_records_located(good + misaligned + good))
    # same bad bytes as the LAST member: tolerated as a truncated tail
    got = list(parse_warc_records_located(good + misaligned))
    assert len(got) == 1


def test_warc_gzip_sole_misaligned_member_raises():
    # ADVICE r05 #3: a single-member archive whose payload does not
    # start a WARC record must fail loudly, not silently yield zero
    # records — the lenient truncated-tail path only applies after at
    # least one earlier member proved the archive member-aligned
    import gzip

    import pytest as _pytest

    from nidaba_spark.sources.rawfiles import (
        parse_warc_records_located,
        wet_record_bytes,
    )

    rec = wet_record_bytes("https://a.org/x", "2024-01-01T00:00:00Z", "hello")
    sole_bad = gzip.compress(rec[10:], 6, mtime=0)
    with _pytest.raises(ValueError, match="only member"):
        list(parse_warc_records_located(sole_bad))
    # the aligned single-member archive still parses
    assert len(list(parse_warc_records_located(gzip.compress(rec, 6, mtime=0)))) == 1


def test_spread_scan_min_bytes_gate(spark):
    # r06: cheap-per-byte callers gate the spread exchange on a
    # plan-time size floor — below it the input comes back unchanged
    # (same object, no Exchange); at/above it (or with the default 0)
    # the scan is redistributed to >= defaultParallelism partitions.
    from nidaba_spark.sources.tables import load, spread_scan

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    gated = spread_scan(docs, key="doc_id", min_bytes=1 << 40)
    assert gated is docs  # below the floor: untouched, zero Exchange
    spread = spread_scan(docs, key="doc_id", min_bytes=1)
    cores = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() >= cores
    # rows are a permutation, never altered
    assert sorted(r.doc_id for r in spread.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
