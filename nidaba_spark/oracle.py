"""Golden oracle: the single-threaded specification of extraction.

This module plays the role of nidaba's reference pipeline output
(reference pytest suite semantics: byte-identical extracted text per
document — BASELINE.json north_rule; nidaba checks its own merge with
fixture hOCR under tests/resources, SURVEY.md §5.1). Because
/root/reference is empty in this sandbox (SURVEY.md §0), THIS FILE is
the operational definition of "what the reference computes": the Spark
pipeline must reproduce its output byte-for-byte per url.

End-to-end spec for one row (url, warc_ts, html, text, lang):

  1. doctype: empty bytes → 'empty'; PDFX magic → 'pdf'; else 'html'.
  2. 'html': decode via charset.decode_bytes, segment via
     htmlseg.segment_html, classify each block with
     classify_rules.classify_block (neighbors: missing → 0 words /
     0.0 link density), keep content blocks in document order with
     kind='content'.
  3. 'pdf': pdfx.parse_pdfx lines, all kept, kind='pdf_line',
     block_id = line index.
  4. Fallback: if nothing was kept (empty/zero-byte html, empty body,
     all-boilerplate page, unparseable payload) and the crawler `text`
     column is non-null and non-empty after normalization, emit one
     block (block_id=0, kind='fallback') with the normalized crawler
     text. If `text` is null too, the document extracts to ''.
  5. text = '\n\n'.join(kept block texts); spans[i] = (block_id,
     start, end, kind) with START/END IN UTF-8 BYTES into text;
     end-start == len(block_text.encode('utf-8')); separators are the
     2 bytes between consecutive spans.

The oracle shares the leaf parsing functions with the pipeline (they
ARE the spec), but runs its own plain-Python classification and span
assembly — the Spark side re-expresses classification as JVM Column
expressions and assembly as an Arrow-batched stage, so the golden test
genuinely cross-checks two implementations of steps 2–5.
"""

from __future__ import annotations

from dataclasses import dataclass

from .functions.charset import decode_bytes
from .functions.classify_rules import block_score, classify_block
from .functions.htmlseg import segment_html
from .functions.pdfx import is_pdfx, parse_pdfx
from .functions.textnorm import normalize_text

SEPARATOR = "\n\n"


@dataclass
class Span:
    block_id: int
    start: int
    end: int
    kind: str


def kept_and_total(
    html: bytes | None, text: str | None
) -> tuple[list[tuple[int, str, str]], int]:
    """Steps 1–4: ([(block_id, kind, block_text)] in reading order,
    pre-classification block count). The count is what the staged
    path's segment stage records as n_blocks, so the fused path can
    report the same n_blocks_dropped = n_blocks - kept_non_fallback."""
    kept: list[tuple[int, str, str]] = []
    n_total = 0
    raw = html or b""
    if is_pdfx(raw):
        body, _ = decode_bytes(raw)
        lines = parse_pdfx(body)
        n_total = len(lines)
        for i, line in enumerate(lines):
            kept.append((i, "pdf_line", line))
    elif raw:
        body, _ = decode_bytes(raw)
        blocks = segment_html(body)
        n = n_total = len(blocks)
        for i, b in enumerate(blocks):
            prev_words = blocks[i - 1].n_words if i > 0 else 0
            prev_ld = blocks[i - 1].link_density if i > 0 else 0.0
            next_words = blocks[i + 1].n_words if i < n - 1 else 0
            if classify_block(b.n_words, b.link_density, prev_words, prev_ld, next_words):
                kept.append((b.block_id, "content", b.text))
    if not kept:
        fallback = normalize_text(text or "")
        if fallback:
            kept.append((0, "fallback", fallback))
    return kept, n_total


def kept_blocks(html: bytes | None, text: str | None) -> list[tuple[int, str, str]]:
    """Steps 1–4: return [(block_id, kind, block_text)] in reading order."""
    return kept_and_total(html, text)[0]


def extract_doc(html: bytes | None, text: str | None) -> tuple[str, list[Span], int]:
    """Steps 1–5 plus the pre-classification block count: one-parse
    extraction for the fused stage (text, spans, n_total_blocks)."""
    kept, n_total = kept_and_total(html, text)
    out_parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    sep_len = len(SEPARATOR.encode("utf-8"))
    for block_id, kind, block_text in kept:
        if out_parts:
            offset += sep_len
        b_len = len(block_text.encode("utf-8"))
        spans.append(Span(block_id=block_id, start=offset, end=offset + b_len, kind=kind))
        out_parts.append(block_text)
        offset += b_len
    return SEPARATOR.join(out_parts), spans, n_total


def extract(html: bytes | None, text: str | None) -> tuple[str, list[Span]]:
    """Steps 1–5: full golden extraction for one document."""
    text_out, spans, _ = extract_doc(html, text)
    return text_out, spans


def golden_rows(rows: list[dict]) -> list[dict]:
    """Oracle over a generated corpus → golden table rows."""
    out = []
    for r in rows:
        text, spans = extract(r["html"], r["text"])
        out.append(
            {
                "url": r["url"],
                "text": text,
                "spans": [vars(s) for s in spans],
            }
        )
    return out


def write_golden_parquet(path: str, rows: list[dict]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_t = pa.struct(
        [
            pa.field("block_id", pa.int32()),
            pa.field("start", pa.int64()),
            pa.field("end", pa.int64()),
            pa.field("kind", pa.string()),
        ]
    )
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("text", pa.string()),
            pa.field("spans", pa.list_(span_t)),
        ]
    )
    pq.write_table(pa.Table.from_pylist(golden_rows(rows), schema=schema), path)
