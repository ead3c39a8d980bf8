"""Fixed StructType schemas per pipeline stage (SURVEY.md §1.2).

nidaba's schema system is implicit (filename-suffix conventions,
reference: nidaba/storage.py `insert_suffix`); we replace it with
explicit schema-on-write — this is what makes checkpoint/resume,
column pruning, and the byte-identity tests possible.
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# S1 decode output — html bytes are consumed here; downstream stages
# never carry the blob (column pruning at the checkpoint boundary).
DECODED = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("doctype", T.StringType()),  # html|pdf|empty
        T.StructField("charset", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("length_bucket", T.IntegerType()),
        T.StructField("body", T.StringType()),  # decoded unicode payload
        T.StructField("fallback_text", T.StringType()),  # normalized crawler text
        T.StructField("_pid", T.IntegerType()),
    ]
)

BLOCK = T.StructType(
    [
        T.StructField("block_id", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_anchor_chars", T.IntegerType()),
        T.StructField("n_anchor_words", T.IntegerType()),
        T.StructField("n_tags", T.IntegerType()),
        T.StructField("link_density", T.DoubleType()),
        T.StructField("text_density", T.DoubleType()),
    ]
)

SEGMENTED = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("doctype", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("length_bucket", T.IntegerType()),
        T.StructField("fallback_text", T.StringType()),
        T.StructField("blocks", T.ArrayType(BLOCK)),
        T.StructField("_pid", T.IntegerType()),
    ]
)

KEPT_BLOCK = T.StructType(
    [
        T.StructField("block_id", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("kind", T.StringType()),  # content|pdf_line|fallback
        T.StructField("score", T.DoubleType()),
    ]
)

CLASSIFIED = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("doctype", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("kept", T.ArrayType(KEPT_BLOCK)),
        T.StructField("_pid", T.IntegerType()),
    ]
)

SPAN = T.StructType(
    [
        T.StructField("block_id", T.IntegerType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("kind", T.StringType()),
    ]
)

EXTRACTED = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("doctype", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("n_blocks_kept", T.IntegerType()),
        T.StructField("n_blocks_dropped", T.IntegerType()),
        T.StructField("stage_ver", T.StringType()),
        T.StructField("_pid", T.IntegerType()),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("input_rows", T.LongType()),
        T.StructField("output_rows", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("bytes_out", T.LongType()),
        T.StructField("started", T.TimestampType()),
        T.StructField("finished", T.TimestampType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)
