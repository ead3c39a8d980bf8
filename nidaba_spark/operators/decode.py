"""S1 — decode: raw page bytes → unicode body (Arrow-batched).

Web-text analog of nidaba's image preprocessing phase
(``img.rgb_to_gray`` / ``deskew`` / ``dewarp`` — reference:
nidaba/tasks/img.py, nidaba/plugins/leptonica.py; SURVEY.md §2A
A3–A5): the stage that turns the raw artifact into the canonical form
segmentation consumes.

Spark shape: one ``mapInPandas`` over the salted-repartitioned pages
table. This is the ONLY stage that touches the ``html`` blob; its
output drops the binary so every later checkpoint is cheap to scan.
No shuffle. Batches are small (session caps Arrow batches at 256
rows) because rows can carry multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import schemas
from ..functions.charset import decode_bytes
from ..functions.pdfx import is_pdfx
from ..functions.textnorm import normalize_text


def _decode_batches(
    batches: Iterator[pd.DataFrame], metrics=None
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf in batches:
        doctypes: list[str] = []
        charsets: list[str] = []
        n_bytes: list[int] = []
        bodies: list[str] = []
        fallbacks: list[str] = []
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
            bodies.append(body)
            fallbacks.append(
                normalize_text(crawler_text) if isinstance(crawler_text, str) else ""
            )
        if metrics is not None:
            metrics.docs_in.add(len(pdf))
            metrics.bytes_in.add(int(sum(n_bytes)))
            metrics.docs_out.add(len(pdf))
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "doctype": doctypes,
                "charset": charsets,
                "n_bytes": pd.Series(n_bytes, dtype="int64"),
                "length_bucket": pdf["length_bucket"],
                "body": bodies,
                "fallback_text": fallbacks,
                "_pid": pd.Series([pid] * len(pdf), dtype="int32"),
            }
        )


def decode_stage(pages: DataFrame, metrics=None) -> DataFrame:
    """pages (+length_bucket) → DECODED. Requires ``length_bucket``.

    metrics: optional StageMetrics — accumulators update live from the
    executors (closure-captured; Accumulator pickles by design).
    """
    cols = ["url", "warc_ts", "html", "text", "lang", "length_bucket"]

    def fn(batches):
        return _decode_batches(batches, metrics)

    return pages.select(*cols).mapInPandas(fn, schema=schemas.DECODED)
