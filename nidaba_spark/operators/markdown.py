"""Structure-preserving extraction: SEGMENTED → Markdown.

The plain-text merge stage (operators/merge.py) flattens every kept
block to a paragraph — the right output for dedup/quality/token
pipelines, but it discards document structure that modern corpora
increasingly keep (headings, lists, quotes, code), because models
trained on structured text learn the structure. This module is the
structure-keeping sibling of merge_stage: the SAME segmentation and
the SAME boilerplate decision (classify's NumWordsRules, imported —
one rule source, never a fork), with the kept blocks rendered as
Markdown from the ``tag`` feature the segmenter already attaches:

    h1..h6        →  '#'×level + ' ' + text
    li            →  '- ' + text
    blockquote    →  '> ' + text
    pre           →  fenced code block (the segmenter's whitespace
                     normalization has already collapsed internal
                     newlines — the fence marks code, it does not
                     restore layout)
    anything else →  plain paragraph

blocks joined by a blank line. Documented subset: tables are emitted
as flattened cell paragraphs (operators/structured.html_tables is the
structured-table extractor); ordered lists render with '-' (the
segmenter does not track item ordinals); PDF blocks are reading-order
paragraphs; pages whose parse keeps nothing fall back to the crawler
``text`` column as one plain block, mirroring the text pipeline's
fallback.

Scale shape: identical to the text path — the rendering is a pure
higher-order Column expression over the kept-blocks array (zero
Python, zero shuffles beyond the pipeline's one salted repartition);
``extract_markdown`` is decode → segment → this, so the html blob is
still consumed by the first Python stage and never shuffled again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from .classify import _is_content


def _fenced(text: Column) -> Column:
    """CommonMark-correct fence: one backtick longer than the longest
    backtick run inside the content (floor 3), so code that documents
    Markdown itself (text containing ```) cannot close the fence
    early and leak the rest of the block into paragraphs."""
    runs = F.split(text, "[^`]+")  # array of the content's ` runs
    maxrun = F.coalesce(
        F.array_max(F.transform(runs, lambda r: F.length(r))), F.lit(0)
    )
    fence = F.repeat(F.lit("`"), F.greatest(F.lit(3), maxrun + F.lit(1)))
    return F.concat(fence, F.lit("\n"), text, F.lit("\n"), fence)


def _render(s: Column) -> Column:
    tag, text = s["tag"], s["text"]
    lvl = F.substring(tag, 2, 1).cast("int")
    return (
        F.when(
            tag.rlike("^h[1-6]$"),
            F.concat(F.repeat(F.lit("#"), lvl), F.lit(" "), text),
        )
        .when(tag == "li", F.concat(F.lit("- "), text))
        .when(tag == "blockquote", F.concat(F.lit("> "), text))
        .when(tag == "pre", _fenced(text))
        .otherwise(text)
    )


def markdown_stage(segmented: DataFrame) -> DataFrame:
    """SEGMENTED → (url, warc_ts, lang, doctype, markdown,
    n_blocks_kept). Same keep decision as classify_stage; see module
    docstring for the rendering contract."""
    blocks = F.col("blocks")
    html_kept = F.filter(
        F.transform(
            blocks,
            lambda x, i: F.struct(
                x["tag"].alias("tag"),
                x["text"].alias("text"),
                _is_content(blocks, x, i).alias("keep"),
            ),
        ),
        lambda s: s["keep"],
    )
    pdf_kept = F.transform(
        blocks,
        lambda x: F.struct(
            F.lit("p").alias("tag"), x["text"].alias("text"), F.lit(True).alias("keep")
        ),
    )
    kept = F.when(F.col("doctype") == "pdf", pdf_kept).otherwise(html_kept)
    md = F.array_join(F.transform(kept, _render), "\n\n")
    use_fallback = (F.size(kept) == 0) & F.col("fallback_text").isNotNull() & (
        F.col("fallback_text") != ""
    )
    return segmented.select(
        "url",
        "warc_ts",
        "lang",
        "doctype",
        F.when(use_fallback, F.col("fallback_text")).otherwise(md).alias("markdown"),
        F.when(use_fallback, F.lit(1))
        .otherwise(F.size(kept))
        .cast("int")
        .alias("n_blocks_kept"),
    )


def extract_markdown(
    pages: DataFrame, nsalt: int = 256, npartitions: int | None = None
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → Markdown documents,
    through the pipeline's prepare → decode → segment stages."""
    from ..pipeline import prepare
    from .segment import decode_segment_stage

    slim = pages.select("url", "warc_ts", "html", "text", "lang")
    # r06: fused decode+segment (one Python pass instead of two —
    # byte-identical; see decode_segment_stage)
    return markdown_stage(decode_segment_stage(prepare(slim, nsalt, npartitions)))
