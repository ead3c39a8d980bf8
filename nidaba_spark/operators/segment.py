"""S2 — segment: unicode body → feature-annotated block array.

Web-text analog of nidaba's binarize + page-segmentation phases
(``binarize.otsu``/``kraken.nlbin`` feature extraction and
``segmentation.tesseract`` layout analysis — reference:
nidaba/tasks/binarize.py, nidaba/tasks/segmentation.py,
nidaba/plugins/{kraken,leptonica}.py; SURVEY.md §2A A6–A10).

Spark shape: ``mapInPandas`` (Arrow-batched); the parser object is
constructed per document but the module-level parse functions are
imported once per Python worker (nidaba's lazy plugin ``setup()``
analog). Emits the ``blocks`` nested array column — Spark's
ArrayType(StructType) standing in for nidaba's zone/line hierarchy
(nidaba/tei.py). No shuffle; blocks never leave their row, which is
what lets the whole pipeline stay narrow after the initial salted
repartition.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import schemas
from ..functions.htmlseg import segment_html
from ..functions.pdfx import parse_pdfx

_CARRY = ["url", "warc_ts", "lang", "doctype", "charset", "n_bytes", "length_bucket", "fallback_text"]


def _pdf_blocks(body: str) -> list[dict]:
    blocks = []
    for i, line in enumerate(parse_pdfx(body)):
        n_chars = len(line)
        n_words = len(line.split())
        lines = max(1, math.ceil(n_chars / 80))
        blocks.append(
            {
                "block_id": i,
                "tag": "pdf_line",
                "depth": 0,
                "text": line,
                "n_chars": n_chars,
                "n_words": n_words,
                "n_anchor_chars": 0,
                "n_anchor_words": 0,
                "n_tags": 0,
                "link_density": 0.0,
                "text_density": n_words / lines,
            }
        )
    return blocks


def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf in batches:
        out_blocks: list[list[dict]] = []
        for doctype, body in zip(pdf["doctype"], pdf["body"]):
            if doctype == "pdf":
                out_blocks.append(_pdf_blocks(body))
            elif doctype == "html" and body:
                out_blocks.append([vars(b) for b in segment_html(body)])
            else:
                out_blocks.append([])
        out = pdf[_CARRY].copy()
        out["blocks"] = out_blocks
        out["_pid"] = pd.Series([pid] * len(pdf), dtype="int32")
        yield out


def segment_stage(decoded: DataFrame) -> DataFrame:
    """DECODED → SEGMENTED."""
    return decoded.select(*_CARRY, "body").mapInPandas(
        _segment_batches, schema=schemas.SEGMENTED
    )


def _decode_segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    from ..functions.charset import decode_bytes
    from ..functions.pdfx import is_pdfx
    from ..functions.textnorm import normalize_text

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf in batches:
        doctypes: list[str] = []
        charsets: list[str] = []
        n_bytes: list[int] = []
        fallbacks: list[str] = []
        out_blocks: list[list[dict]] = []
        for raw, crawler_text in zip(pdf["html"], pdf["text"]):
            raw = bytes(raw) if raw is not None else b""
            if not raw:
                doctype, charset, body = "empty", "empty", ""
            elif is_pdfx(raw):
                doctype = "pdf"
                body, charset = decode_bytes(raw)
            else:
                doctype = "html"
                body, charset = decode_bytes(raw)
            doctypes.append(doctype)
            charsets.append(charset)
            n_bytes.append(len(raw))
            fallbacks.append(
                normalize_text(crawler_text) if isinstance(crawler_text, str) else ""
            )
            if doctype == "pdf":
                out_blocks.append(_pdf_blocks(body))
            elif doctype == "html" and body:
                out_blocks.append([vars(b) for b in segment_html(body)])
            else:
                out_blocks.append([])
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "doctype": doctypes,
                "charset": charsets,
                "n_bytes": pd.Series(n_bytes, dtype="int64"),
                "length_bucket": pdf["length_bucket"],
                "fallback_text": fallbacks,
                "blocks": out_blocks,
                "_pid": pd.Series([pid] * len(pdf), dtype="int32"),
            }
        )


def decode_segment_stage(pages: DataFrame) -> DataFrame:
    """pages (+length_bucket) → SEGMENTED in ONE Python pass — the
    fused twin of ``segment_stage(decode_stage(pages))`` (guide §4:
    each separate mapInPandas stage round-trips the full decoded body
    JVM→Python→JVM; fusing halves the Arrow transfers and the pandas
    materializations). Byte-identical by construction: the loop body
    is decode_stage's followed by segment_stage's, and with no shuffle
    between the stages the partition ids — and therefore ``_pid`` —
    are the same. Used by extract_markdown; the checkpointed Pipeline
    keeps the separate stages (its stage boundaries are checkpoints).
    Pinned by tests/test_markdown.py::test_fused_decode_segment_equals_staged.
    """
    cols = ["url", "warc_ts", "html", "text", "lang", "length_bucket"]
    return pages.select(*cols).mapInPandas(
        _decode_segment_batches, schema=schemas.SEGMENTED
    )
