"""Golden end-to-end + invariance suites (SURVEY.md §5.2.1/2).

Gate: byte-identical extracted text per url vs the single-threaded
oracle (BASELINE.json north_rule), spans slice back exactly, and the
output is invariant to partition count / salt count.
"""

from __future__ import annotations

import pytest

from nidaba_spark import pipeline


def _collect(ext_df):
    return {
        r["url"]: (
            r["text"],
            [(s["block_id"], s["start"], s["end"], s["kind"]) for s in r["spans"]],
        )
        for r in ext_df.collect()
    }


@pytest.fixture(scope="module")
def extracted(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    return _collect(pipeline.extract(pages))


def test_byte_identical_text_per_url(extracted, golden):
    assert set(extracted) == set(golden)
    mismatches = [u for u in golden if extracted[u][0] != golden[u][0]]
    assert mismatches == [], f"{len(mismatches)} urls differ, e.g. {mismatches[:3]}"


def test_spans_match_golden(extracted, golden):
    mismatches = [u for u in golden if extracted[u][1] != golden[u][1]]
    assert mismatches == []


def test_spans_slice_back(extracted):
    for url, (text, spans) in extracted.items():
        tb = text.encode("utf-8")
        prev_end = 0
        for i, (_bid, start, end, kind) in enumerate(spans):
            assert 0 <= start <= end <= len(tb), (url, start, end)
            if i > 0:
                assert start == prev_end + 2  # the '\n\n' separator
            piece = tb[start:end].decode("utf-8")
            assert piece and piece == piece.strip(), url
            prev_end = end
        if spans:
            assert prev_end == len(tb)


def test_edge_variants_present_and_handled(extracted, golden, corpus_rows):
    from nidaba_spark.corpus import variant

    by_var = {}
    for k, r in enumerate(corpus_rows):
        by_var.setdefault(variant(k), []).append(r["url"])
    # the smoke corpus covers every edge class
    assert {"zero", "emptybody", "mega", "pdf2col", "pdf", "broken",
            "scriptwrap", "nestedboiler", "normal"} <= set(by_var)
    for var, urls in by_var.items():
        for u in urls:
            assert extracted[u][0] == golden[u][0], (var, u)


@pytest.mark.parametrize(
    "npartitions,nsalt,mode",
    [(1, 1, "fused"), (7, 4, "staged"), (32, 32, "fused"), (8, 8, "fused_noshuffle")],
)
def test_partitioning_invariance(spark, pages_path, golden, npartitions, nsalt, mode):
    pages = spark.read.parquet(pages_path)
    got = _collect(pipeline.extract(pages, nsalt=nsalt, npartitions=npartitions, mode=mode))
    assert all(got[u] == golden[u] for u in golden)


def test_fused_equals_staged(spark, pages_path):
    """The two implementations (Python spec vs JVM Column exprs) must
    agree byte-for-byte — the core cross-validation of the engine.
    Compares EVERY output column (incl. n_blocks_kept/_dropped and
    doctype), not just text+spans; only _pid (physical partition id)
    is excluded as non-semantic."""
    pages = spark.read.parquet(pages_path)

    def full(df):
        cols = [c for c in df.columns if c != "_pid"]
        return {
            r["url"]: tuple(
                tuple((s["block_id"], s["start"], s["end"], s["kind"]) for s in r[c])
                if c == "spans"
                else r[c]
                for c in cols
            )
            for r in df.select(*cols).collect()
        }

    fused = full(pipeline.extract(pages, mode="fused"))
    staged = full(pipeline.extract(pages, mode="staged"))
    assert set(fused) == set(staged)
    diff = [u for u in fused if fused[u] != staged[u]]
    assert diff == [], f"{len(diff)} urls differ on full columns, e.g. {diff[:3]}"


def test_fused_arrow_equals_pandas(spark, pages_path):
    """The mapInArrow twin of the fused stage (VERDICT r03 next #4)
    must be byte-identical to the mapInPandas path on every column,
    both with and without the crawler-text pruning."""
    from nidaba_spark.operators.fused import fused_extract_stage

    pages = spark.read.parquet(pages_path)

    def full(df):
        cols = [c for c in df.columns if c != "_pid"]
        return {
            r["url"]: tuple(
                tuple((s["block_id"], s["start"], s["end"], s["kind"]) for s in r[c])
                if c == "spans"
                else r[c]
                for c in cols
            )
            for r in df.select(*cols).collect()
        }

    for with_text in (True, False):
        prepared = pipeline.prepare(
            pages if with_text else pages.select("url", "warc_ts", "html", "lang")
        )
        a = full(fused_extract_stage(prepared, with_text=with_text, engine="arrow"))
        p = full(fused_extract_stage(prepared, with_text=with_text, engine="pandas"))
        assert set(a) == set(p)
        diff = [u for u in a if a[u] != p[u]]
        assert diff == [], f"{len(diff)} urls differ (with_text={with_text}): {diff[:3]}"

    # the conf knob routes the whole pipeline through arrow too
    spark.conf.set("spark.nidaba.fusedEngine", "arrow")
    try:
        got = _collect(pipeline.extract(pages, mode="fused"))
    finally:
        spark.conf.unset("spark.nidaba.fusedEngine")
    want = _collect(pipeline.extract(pages, mode="fused"))
    assert got == want


def test_staged_equals_fused(spark, pages_path, tmp_path, golden):
    pages = spark.read.parquet(pages_path)
    p = pipeline.Pipeline(spark, str(tmp_path), run_id="eq")
    got = _collect(p.run(pages).select("url", "text", "spans"))
    assert all(got[u] == golden[u] for u in golden)


def test_pruned_fused_edge_fallback_mixes(spark):
    """The two-phase pruned path must survive its branch-emptiness
    edges: a corpus where EVERY row needs the crawler-text fallback
    (ok-branch empty), one where NONE does (fallback-branch empty),
    and null crawler text. Outputs must match the oracle row-for-row."""
    import datetime as dt

    from nidaba_spark import oracle, pipeline, schemas

    ts = dt.datetime(2024, 1, 1)
    all_needy = [
        (f"u{i}", ts, b"", f"  Crawler   text {i} " if i % 3 else None, "en")
        for i in range(9)
    ]
    none_needy = [
        (
            f"v{i}",
            ts,
            ("<html><body><p>" + (f"Real visible content number {i} with plenty of words here. " * 8) + "</p></body></html>").encode(),
            f"crawler {i}",
            "en",
        )
        for i in range(9)
    ]
    for rows in (all_needy, none_needy, all_needy + none_needy):
        pages = spark.createDataFrame(rows, schema=schemas.PAGES)
        got = {
            r["url"]: (r["text"], tuple((s["kind"],) for s in r["spans"]))
            for r in pipeline.extract(pages, npartitions=4).collect()
        }
        assert len(got) == len(rows)
        for u, _, html, text, _ in rows:
            want_text, want_spans = oracle.extract(html, text)
            assert got[u][0] == want_text, u
            assert got[u][1] == tuple((s.kind,) for s in want_spans), u


def test_fused_fallback_keeps_null_warc_ts_rows(spark):
    """The WARC source coerces malformed warc-date to NaT, so NULL
    warc_ts pages are a designed-for input. The fused fallback join
    must compare the timestamp NULL-SAFE — a plain equi-join silently
    dropped every null-ts page whose parse keeps nothing, losing its
    crawler-text fallback document entirely (review r05)."""
    import datetime as dt

    from nidaba_spark import pipeline, schemas

    rows = [
        # null ts + boilerplate-only html -> needs the fallback
        ("https://nt.example/a", None, b"", "crawler text alpha here", "en"),
        # null ts + real content -> ok branch
        (
            "https://nt.example/b",
            None,
            (
                "<html><body><p>"
                + "Real visible content with plenty of words here. " * 8
                + "</p></body></html>"
            ).encode(),
            "crawler beta",
            "en",
        ),
        # normal ts control
        (
            "https://nt.example/c",
            dt.datetime(2024, 1, 1),
            b"",
            "crawler text gamma",
            "en",
        ),
    ]
    pages = spark.createDataFrame(rows, schema=schemas.PAGES)
    got = {
        r["url"]: r["text"]
        for r in pipeline.extract(pages, npartitions=4).collect()
    }
    assert set(got) == {u for u, *_ in rows}
    assert "alpha" in got["https://nt.example/a"]
    assert "gamma" in got["https://nt.example/c"]
