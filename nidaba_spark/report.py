"""Dataset card: the machine-readable report a curation pipeline
publishes with every corpus release — what's in it, how big, how
clean. Everything is computed in TWO aggregation jobs regardless of
corpus size (review r05 folded what had grown to 3-4 full scans back
to the documented price):

  1. one DOC-LEVEL agg pass: row/token/byte totals, byte quantiles
     via percentile_approx (single-pass KLL-style), quality mean +
     decile bands when present, and the exact-dup rate from
     count(distinct (xxhash64(text), octet_length(text))) — hash plus
     length, the same birthday guard exact_dedup uses;
  2. one TOKEN-LEVEL pass (the shared dedup.tokens_col definition, so
     the report's token universe can never diverge from the dedup
     pipeline's): regex-token total + DataSketches HLL distinct-token
     estimate;

plus one small groupBy job per grouping column (source/lang when
present): rows + tokens per group, top-1000 with an explicit
``truncated`` marker when groups exceed the cap (it used to truncate
silently). Every number that reaches the driver is O(1) or O(groups);
nothing here is a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.dedup import tokens_col
from .operators.textstats import token_count_ws

_QUANTS = [0.1, 0.25, 0.5, 0.75, 0.9]
_GROUP_CAP = 1000


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source", "lang"),
) -> dict:
    """One JSON-able dict describing the corpus. ``group_cols`` that
    are absent from the schema are skipped silently."""
    t = F.col(text_col)
    ntok = token_count_ws(t)
    has_quality = "quality" in docs.columns
    scalar_aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(ntok).alias("total_ws_tokens"),
        F.sum(F.octet_length(t)).alias("total_text_bytes"),
        F.avg(F.octet_length(t)).alias("avg_doc_bytes"),
        F.percentile_approx(F.octet_length(t), _QUANTS).alias(
            "doc_bytes_quantiles"
        ),
        # length rides with the hash (exact_dedup's birthday guard);
        # the -1 coalesce keeps null-text docs in the multi-column
        # distinct (count_distinct drops rows with any NULL column)
        F.count_distinct(
            F.xxhash64(t), F.coalesce(F.octet_length(t), F.lit(-1))
        ).alias("distinct_texts"),
    ]
    if has_quality:
        scalar_aggs += [
            F.round(F.avg("quality"), 4).alias("q_mean"),
            F.percentile_approx(F.col("quality"), _QUANTS).alias("q_quants"),
        ]
    scalars = docs.agg(*scalar_aggs).collect()[0]
    row = (
        docs.select(F.explode_outer(tokens_col(t)).alias("_w"))
        .agg(
            F.count("_w").alias("total_regex_tokens"),
            F.hll_sketch_estimate(F.hll_sketch_agg("_w")).alias(
                "distinct_tokens_est"
            ),
        )
        .collect()[0]
    )
    rows = int(scalars["rows"])
    report = {
        "rows": rows,
        "total_ws_tokens": int(scalars["total_ws_tokens"] or 0),
        "total_text_bytes": int(scalars["total_text_bytes"] or 0),
        "avg_doc_bytes": round(float(scalars["avg_doc_bytes"] or 0.0), 2),
        "doc_bytes_quantiles": dict(
            zip(
                [f"p{int(q * 100)}" for q in _QUANTS],
                [int(x) for x in (scalars["doc_bytes_quantiles"] or [])],
            )
        ),
        "total_regex_tokens": int(row["total_regex_tokens"] or 0),
        "distinct_texts": int(scalars["distinct_texts"]),
        "exact_dup_rate": round(
            1.0 - int(scalars["distinct_texts"]) / rows, 6
        )
        if rows
        else 0.0,
        "distinct_tokens_est": int(row["distinct_tokens_est"] or 0),
    }
    if has_quality:
        report["quality"] = {
            "mean": float(scalars["q_mean"] or 0.0),
            **dict(
                zip(
                    [f"p{int(x * 100)}" for x in _QUANTS],
                    [round(float(v), 4) for v in (scalars["q_quants"] or [])],
                )
            ),
        }
    for col in group_cols:
        if col not in docs.columns:
            continue
        groups = (
            docs.groupBy(col)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(ntok).alias("tokens"),
            )
            .orderBy(F.desc("rows"), col)
            .limit(_GROUP_CAP + 1)
            .collect()
        )
        truncated = len(groups) > _GROUP_CAP
        report[f"by_{col}"] = {
            str(r[col]): {"rows": int(r["rows"]), "tokens": int(r["tokens"] or 0)}
            for r in groups[:_GROUP_CAP]
        }
        if truncated:
            report[f"by_{col}_truncated"] = True
    return report
