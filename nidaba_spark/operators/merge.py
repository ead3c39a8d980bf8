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

_SPANS_INIT = (
    "CAST(named_struct('off', 0L, 'spans', "
    "CAST(array() AS array<struct<block_id:int,start:bigint,end:bigint,kind:string>>)) "
    "AS struct<off:bigint, spans:array<struct<block_id:int,start:bigint,end:bigint,kind:string>>>)"
)


def _spans_col():
    def merge(acc, x):
        start = acc["off"] + F.when(
            F.size(acc["spans"]) > 0, F.lit(_SEP_BYTES).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        end = start + F.octet_length(x["text"]).cast("long")
        span = F.struct(
            x["block_id"].alias("block_id"),
            start.alias("start"),
            end.alias("end"),
            x["kind"].alias("kind"),
        )
        return F.struct(
            end.alias("off"),
            F.concat(acc["spans"], F.array(span)).alias("spans"),
        )

    return F.aggregate(
        F.col("kept"), F.expr(_SPANS_INIT), merge, lambda acc: acc["spans"]
    )


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
