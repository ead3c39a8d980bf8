"""Dataset card: the machine-readable report a curation pipeline
publishes with every corpus release — what's in it, how big, how
clean. Everything is computed in TWO aggregation jobs regardless of
corpus size:

  1. one full-corpus agg pass: row/token/byte totals, distinct-token
     estimate (DataSketches HLL — JVM-side, mergeable), quality mean +
     decile bands via approx_percentile (single-pass KLL-style), and
     the exact-dup rate from count(distinct xxhash64(text)) (two-phase
     codegen agg);
  2. one groupBy pass per grouping column (source/lang when present):
     rows + tokens per group.

Every number that reaches the driver is O(1) or O(groups); nothing
here is a data collect. All expressions are codegen built-ins — the
report costs two scans at any scale, and at 10^12 rows both
aggregations are the map-side-combined shapes the rest of this repo
ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.textstats import token_count_ws

_QUANTS = [0.1, 0.25, 0.5, 0.75, 0.9]


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source", "lang"),
) -> dict:
    """One JSON-able dict describing the corpus. ``group_cols`` that
    are absent from the schema are skipped silently."""
    t = F.col(text_col)
    ntok = token_count_ws(t)
    base = docs.select(
        t.alias("_t"),
        ntok.alias("_n"),
        F.octet_length(t).alias("_b"),
        F.xxhash64(t).alias("_h"),
        F.explode_outer(
            F.filter(F.split(F.lower(t), r"[^a-z0-9]+"), lambda x: x != F.lit(""))
        ).alias("_w"),
    )
    row = base.agg(
        F.count_distinct("_h").alias("distinct_texts"),
        F.sum(F.when(F.col("_w").isNull(), 0).otherwise(1)).alias("total_regex_tokens"),
        F.hll_sketch_estimate(F.hll_sketch_agg("_w")).alias("distinct_tokens_est"),
    ).collect()[0]
    scalars = docs.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(ntok).alias("total_ws_tokens"),
        F.sum(F.octet_length(t)).alias("total_text_bytes"),
        F.avg(F.octet_length(t)).alias("avg_doc_bytes"),
        F.expr(
            f"approx_percentile(octet_length({text_col}), "
            f"array({','.join(str(q) for q in _QUANTS)}))"
        ).alias("doc_bytes_quantiles"),
    ).collect()[0]
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
        "distinct_texts": int(row["distinct_texts"]),
        "exact_dup_rate": round(
            1.0 - int(row["distinct_texts"]) / rows, 6
        )
        if rows
        else 0.0,
        "distinct_tokens_est": int(row["distinct_tokens_est"] or 0),
    }
    if "quality" in docs.columns:
        q = docs.agg(
            F.round(F.avg("quality"), 4).alias("mean"),
            F.expr(
                "approx_percentile(quality, "
                f"array({','.join(str(x) for x in _QUANTS)}))"
            ).alias("qs"),
        ).collect()[0]
        report["quality"] = {
            "mean": float(q["mean"] or 0.0),
            **dict(
                zip(
                    [f"p{int(x * 100)}" for x in _QUANTS],
                    [round(float(v), 4) for v in (q["qs"] or [])],
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
            .limit(1000)
            .collect()
        )
        report[f"by_{col}"] = {
            str(r[col]): {"rows": int(r["rows"]), "tokens": int(r["tokens"] or 0)}
            for r in groups
        }
    return report
