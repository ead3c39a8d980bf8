"""Vectorized Python operator forms (SURVEY.md §2B B19, B39, B41–B43)
each exposed as a driver-checkable query.

These exist to pin down every UDF shape Spark offers — scalar
pandas_udf, grouped-map applyInPandas, grouped-agg UDAF, mapInArrow —
on real tables with DuckDB oracles where the computation is
SQL-expressible. Hot-path guidance stays the same (SURVEY.md §4.3):
built-in Column expressions first, Arrow-batched Python only when the
computation needs real Python (parsers, codecs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

ORACLE: dict[str, str] = {}


# ------------------------------------------------------------------- B19
def q_orders_list_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic array agg: sort_array(collect_list(...)) — the
    collect_list itself is order-nondeterministic under shuffling, the
    explicit sort is what makes it checkpoint-safe (SURVEY.md §4.3.5)."""
    orders = load(spark, sf, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "o_custkey",
            F.array_join(F.transform("order_keys", lambda x: x.cast("string")), ",").alias("order_keys"),
            "n",
        )
    )


ORACLE["orders_list_per_customer"] = """
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
       count(*) AS n
FROM orders GROUP BY o_custkey
"""


# ------------------------------------------------------------------- B39
def q_scalar_pandas_udf_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar pandas_udf (Series→Series, Arrow-vectorized): line margin."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def margin(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        # no intermediate rounding: numpy rounds half-to-even, DuckDB
        # half-away-from-zero — only the final aggregate is rounded
        return price * (1.0 - discount) * (1.0 + tax)

    li = load(spark, sf, "lineitem")
    return (
        li.withColumn("m", margin("l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("m"), 2).alias("sum_margin"), F.count(F.lit(1)).alias("n"))
    )


ORACLE["scalar_pandas_udf_margin"] = """
SELECT l_returnflag,
       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_margin,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------------------------- B41
def q_apply_in_pandas_lang_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language corpus stats, one pandas
    DataFrame per group in, one row out."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "mean_chars": [float(pdf["n_chars"].mean())],
                "max_chars": [int(pdf["n_chars"].max())],
            }
        )

    docs = load(spark, sf, "documents")
    out = docs.groupBy("lang").applyInPandas(
        stats, schema="lang string, n_docs long, mean_chars double, max_chars long"
    )
    # round JVM-side: python round() is half-to-even, DuckDB half-away
    return out.withColumn("mean_chars", F.round("mean_chars", 4))


ORACLE["apply_in_pandas_lang_stats"] = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS mean_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


# ------------------------------------------------------------------- B43
def q_udaf_weighted_value(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-agg pandas UDAF: event value weighted by JSON prop k."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        tw = float(w.sum())
        return float((v * w).sum() / tw) if tw else 0.0

    ev = load(spark, sf, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("double")
    )
    # NB: a grouped-agg pandas UDF cannot be mixed with JVM aggregates
    # in one agg() — Spark constraint (INVALID_PANDAS_UDF_PLACEMENT).
    return (
        ev.groupBy("event_type")
        .agg(weighted_avg("value", "k").alias("weighted_value"))
        .withColumn("weighted_value", F.round("weighted_value", 4))
    )


ORACLE["udaf_weighted_value"] = """
SELECT event_type,
       CASE WHEN sum(k) > 0 THEN round(sum(value * k) / sum(k), 4) ELSE 0.0 END AS weighted_value
FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k FROM events)
GROUP BY event_type
"""


# ------------------------------------------------------------------- B42
def q_map_in_arrow_sha(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow: zero-pandas path over binary payloads — the form the
    decode stage uses for multi-GB blob partitions at cluster scale."""
    import hashlib

    import pyarrow as pa

    def sha_batches(batches):
        for batch in batches:
            ids = batch.column("media_id")
            payloads = batch.column("payload")
            shas = [
                hashlib.sha256(p.as_py() or b"").hexdigest() for p in payloads
            ]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(shas, pa.string())], names=["media_id", "sha"]
            )

    from ..operators.multimodal import synthesize_media

    media = synthesize_media(load(spark, sf, "documents")).select("media_id", "payload")
    return media.mapInArrow(sha_batches, schema="media_id long, sha string")


ORACLE["map_in_arrow_sha"] = """
SELECT doc_id AS media_id, sha256(text) AS sha FROM documents
"""


QUERIES = {
    "orders_list_per_customer": q_orders_list_per_customer,
    "scalar_pandas_udf_margin": q_scalar_pandas_udf_margin,
    "apply_in_pandas_lang_stats": q_apply_in_pandas_lang_stats,
    "udaf_weighted_value": q_udaf_weighted_value,
    "map_in_arrow_sha": q_map_in_arrow_sha,
}
