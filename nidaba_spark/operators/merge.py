"""S4 — merge: kept blocks → final text + UTF-8 byte-offset spans.

Web-text analog of nidaba's output-merging step (``merge_hocr.merge``
+ ``output.tei2txt`` — reference: nidaba/merge_hocr.py,
nidaba/algorithms/median.py, nidaba/tasks/output.py; SURVEY.md §2A
A14–A17): where nidaba aligns competing hOCR variants and serializes
TEI, we assemble the kept blocks (already in document order inside
the row's array — no groupBy/shuffle needed) into one string and emit
the span array, nidaba's hOCR/TEI-span analog.

Spark shape: pure Column expressions — ``array_join`` for the text
and a higher-order ``aggregate`` with a (offset, spans) struct
accumulator for the byte-offset prefix sum. ``octet_length`` counts
UTF-8 bytes, making "byte-identical" checkable JVM-side. No Python,
no shuffle; deterministic for any partitioning because block order is
row-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGE_VER = "v1"
_SEP = "\n\n"
_SEP_BYTES = len(_SEP.encode("utf-8"))


def _spans_col():
    # start_i = sum(byte lengths of blocks 0..i-1) + i * sep bytes.
    # The previous form folded with concat(acc.spans, array(span)),
    # copying the accumulated struct array on EVERY element — O(n^2)
    # allocations per document inside an already-interpreted
    # (CodegenFallback) expression; a 10k-block page stalled its task
    # far beyond the parse cost (review r05). The index/slice form
    # still does O(n^2) integer adds but zero array copies.
    kept = F.col("kept")
    lens = F.transform(kept, lambda x: F.octet_length(x["text"]).cast("long"))

    def span(x, i):
        start = F.aggregate(
            F.slice(lens, F.lit(1), i),
            F.lit(0).cast("long"),
            lambda a, e: a + e,
        ) + i.cast("long") * F.lit(_SEP_BYTES).cast("long")
        end = start + F.octet_length(x["text"]).cast("long")
        return F.struct(
            x["block_id"].alias("block_id"),
            start.alias("start"),
            end.alias("end"),
            x["kind"].alias("kind"),
        )

    return F.transform(kept, span)


def merge_stage(classified: DataFrame) -> DataFrame:
    """CLASSIFIED → EXTRACTED."""
    kept = F.col("kept")
    text = F.array_join(F.transform(kept, lambda x: x["text"]), _SEP)
    n_kept_real = F.size(F.filter(kept, lambda x: x["kind"] != F.lit("fallback")))
    return classified.select(
        "url",
        "warc_ts",
        "lang",
        "doctype",
        text.alias("text"),
        _spans_col().alias("spans"),
        F.size(kept).alias("n_blocks_kept"),
        (F.col("n_blocks") - n_kept_real).alias("n_blocks_dropped"),
        F.lit(STAGE_VER).alias("stage_ver"),
        "_pid",
    )
