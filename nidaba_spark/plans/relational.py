"""Relational substrate queries (SURVEY.md §2B) with DuckDB oracle SQL.

Each ``q_*`` function is a Spark DataFrame query over the sandbox
tables; ``ORACLE[name]`` is the ANSI-SQL mirror DuckDB runs on the
same parquet for the driver's correctness gate. Conventions that make
the value-hash comparison stable:

  * every computed column is aliased identically on both sides;
  * doubles are round()ed (2–6 places) on both sides;
  * timestamps are emitted as face-value strings
    (date_format / strftime) — TZ-independent because the parquet
    timestamps are NTZ on both engines;
  * deterministic tie-breaks on every window/top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load, spread_scan

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
TS_FMT_SPARK_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK_US = "%Y-%m-%d %H:%M:%S.%f"

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------- B14/B28/B6
def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregation with pushed-down date filter."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------- B7/B8
def q_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Star join: fact orders ⋈ customer ⋈ broadcast nation/region."""
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE["revenue_by_nation"] = """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------- B9
def q_customer_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join keeping order-less customers (n_orders = 0)."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


ORACLE["customer_order_stats"] = """
SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


# --------------------------------------------------------------------- B10
def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ORACLE["customers_without_orders"] = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_active_customer_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Semi join: segments of customers that do have orders."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


ORACLE["active_customer_segments"] = """
SELECT c_mktsegment, count(*) AS n_active FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------- B20
def q_top_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    # r06: explicit 3-column projection BEFORE the spread exchange
    # (pruning does not fully push through RepartitionByExpression),
    # then spread_scan so the window sort runs cluster-wide instead
    # of on the input's 2 row-group tasks (guide §2.2/§2.4).
    # Keyed on o_custkey — the WINDOW's partition key — so the spread
    # IS the window's required distribution and the plan keeps ONE
    # Exchange (keyed on o_orderkey the window re-shuffled everything:
    # 2 Exchanges, and the partial WindowGroupLimit cut almost nothing
    # with ~10 orders/customer scattered across partitions; measured
    # at the 1.5M-row twin: noop 1.04 -> 0.66 s, identical rows).
    # min_bytes on the PROJECTED estimate (1.1 MB at sf0.1, ~11 MB at
    # sf1.0): a window sort is cheap per byte, and at sf0.1 the extra
    # exchange read 0.25 vs 0.21 s unspread (r06 A/B).
    orders = spread_scan(
        load(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        key="o_custkey",
        min_bytes=4 << 20,
    )
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


ORACLE["top_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
         ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


# ---------------------------------------------------------------- B21/B22
def q_running_order_total(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", TS_FMT_SPARK).alias("order_date"),
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_total"),
        F.round(F.lag("o_totalprice", 1, 0.0).over(w), 2).alias("prev_price"),
    )


ORACLE["running_order_total"] = f"""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '{TS_FMT_DUCK}') AS order_date,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price
FROM orders
"""


# --------------------------------------------------------------------- B17
def q_orders_rollup(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


ORACLE["orders_rollup"] = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_cube_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
    )


ORACLE["cube_lineitem"] = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_sets_orders(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


ORACLE["grouping_sets_orders"] = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------- B15/B29
def q_distinct_users_per_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE["distinct_users_per_type"] = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_events_per_hour(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), TS_FMT_SPARK).alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


ORACLE["events_per_hour"] = f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------- B33
def q_events_json(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k_mod", F.pmod(k, F.lit(7)))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


ORACLE["events_json"] = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 7 AS k_mod,
       count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------- B32
def q_props_map(spark: SparkSession, sf: str) -> DataFrame:
    """MapType path: JSON props → map<string,int> → map_keys/element_at."""
    ev = load(spark, sf, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.withColumn("m", m)
        .select(F.explode("m").alias("prop_key", "_v"))
        .groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_v").alias("sum_v"))
    )


ORACLE["props_map"] = """
SELECT k AS prop_key, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.' || k) AS INT)) AS BIGINT) AS sum_v
FROM events, unnest(json_keys(props)) AS t(k)
GROUP BY k
"""


# --------------------------------------------------------------------- B11
def q_errors_after_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Range (theta) join: errors within 10 min after a purchase, same user."""
    ev = load(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    joined = p.join(
        e,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") > F.col("p_ts"))
        & (F.col("e_ts") <= F.expr("p_ts + INTERVAL 10 MINUTES")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(F.count("e_ts").alias("n_errors_10m"))


ORACLE["errors_after_purchase"] = """
SELECT p.event_id AS purchase_id, count(e.ts) AS n_errors_10m
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 10 MINUTE
GROUP BY 1
"""


# --------------------------------------------------------------------- B12
def q_asof_view_before_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: latest prior 'view' of the same user per purchase."""
    ev = load(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("u"), F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    j = p.join(v, (F.col("u") == F.col("vu")) & (F.col("v_ts") <= F.col("p_ts")))
    w = Window.partitionBy("purchase_id").orderBy(F.desc("v_ts"), F.desc("view_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "view_id", F.date_format("v_ts", TS_FMT_SPARK_US).alias("view_ts"))
    )


ORACLE["asof_view_before_purchase"] = f"""
SELECT purchase_id, view_id, strftime(v_ts, '{TS_FMT_DUCK_US}') AS view_ts FROM (
  SELECT p.event_id AS purchase_id, v.event_id AS view_id, v.ts AS v_ts,
         row_number() OVER (PARTITION BY p.event_id ORDER BY v.ts DESC, v.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND v.ts <= p.ts)
WHERE rn = 1
"""


# --------------------------------------------------------------- B25/B26
def q_intersect_except_customers(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    big_spenders = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("t"))
        .filter(F.col("t") > 5000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    both = big_spenders.intersect(building).select("c_custkey", F.lit("both").alias("tag"))
    only_big = big_spenders.exceptAll(building).distinct().select(
        "c_custkey", F.lit("only_big").alias("tag")
    )
    return both.unionByName(only_big)


ORACLE["intersect_except_customers"] = """
WITH big AS (SELECT o_custkey AS c_custkey FROM orders GROUP BY 1 HAVING sum(o_totalprice) > 5000),
     bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM big INTERSECT SELECT * FROM bld)
UNION ALL
SELECT c_custkey, 'only_big' AS tag FROM (SELECT * FROM big EXCEPT SELECT * FROM bld)
"""


# --------------------------------------------------------------------- B13
def q_region_event_grid(spark: SparkSession, sf: str) -> DataFrame:
    region = load(spark, sf, "region")
    ev = load(spark, sf, "events")
    types = ev.select("event_type").distinct()
    return region.crossJoin(types).select("r_name", "event_type")


ORACLE["region_event_grid"] = """
SELECT r_name, event_type FROM region CROSS JOIN (SELECT DISTINCT event_type FROM events)
"""


# --------------------------------------------------------------------- B35
def q_acctbal_buckets(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        cust.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )


ORACLE["acctbal_buckets"] = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
       count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
FROM customer GROUP BY 1
"""


# --------------------------------------------------------------------- B24
def q_top_docs_by_chars(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        docs.orderBy(F.desc("n_chars"), F.col("doc_id"))
        .limit(10)
        .select("doc_id", "n_chars", "lang")
    )


ORACLE["top_docs_by_chars"] = """
SELECT doc_id, n_chars, lang FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10
"""


# --------------------------------------------------------------------- B31
def q_top_words(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    words = F.filter(F.split(F.lower("text"), r"[^a-z0-9]+"), lambda t: t != F.lit(""))
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("word"))
        .limit(20)
    )


ORACLE["top_words"] = """
SELECT word, count(*) AS cnt FROM (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')) AS word
  FROM documents)
GROUP BY word ORDER BY cnt DESC, word LIMIT 20
"""


# --------------------------------------------------------------------- B30/B36
def q_part_brand_stats(spark: SparkSession, sf: str) -> DataFrame:
    part = load(spark, sf, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
        F.round(F.avg(F.log(F.col("p_retailprice") + 1)), 6).alias("avg_log_price"),
    )


ORACLE["part_brand_stats"] = """
SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price,
       min(p_size) AS min_size, max(p_size) AS max_size,
       round(avg(ln(p_retailprice + 1)), 6) AS avg_log_price
FROM part GROUP BY p_brand
"""


def q_supplier_nation(spark: SparkSession, sf: str) -> DataFrame:
    sup = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"), F.round(F.sum("s_acctbal"), 2).alias("total_bal"))
    )


ORACLE["supplier_nation"] = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
"""


# --------------------------------------------------------------------- B48 (batch analog)
def q_sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (5-min inactivity) via lag + running sum."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") > F.expr("lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) + INTERVAL 5 MINUTES")),
        1,
    ).otherwise(0)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_sess", gap)
        .withColumn("sess_id", F.sum("new_sess").over(frame))
        .groupBy("user_id", "sess_id")
        .agg(
            F.date_format(F.min("ts"), TS_FMT_SPARK_US).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


ORACLE["sessionize_events"] = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
  FROM marked)
SELECT user_id, sess_id, strftime(min(ts), '{TS_FMT_DUCK_US}') AS session_start,
       count(*) AS n_events, round(sum(value), 2) AS session_value
FROM sess GROUP BY user_id, sess_id
"""


# --------------------------------------------------------------- B14 (exact percentiles)
def q_order_price_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE["order_price_quantiles"] = """
SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90, count(*) AS n
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------- B16 (rows-only)
def q_approx_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ approx count-distinct — no exact oracle by construction."""
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


# --------------------------------------------------------------------- B37 (rows-only)
def q_sample_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.sample(fraction=0.1, seed=42).select("event_id", "event_type")


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "customer_order_stats": q_customer_order_stats,
    "customers_without_orders": q_customers_without_orders,
    "active_customer_segments": q_active_customer_segments,
    "top_orders_per_customer": q_top_orders_per_customer,
    "running_order_total": q_running_order_total,
    "orders_rollup": q_orders_rollup,
    "cube_lineitem": q_cube_lineitem,
    "grouping_sets_orders": q_grouping_sets_orders,
    "distinct_users_per_type": q_distinct_users_per_type,
    "events_per_hour": q_events_per_hour,
    "events_json": q_events_json,
    "errors_after_purchase": q_errors_after_purchase,
    "asof_view_before_purchase": q_asof_view_before_purchase,
    "intersect_except_customers": q_intersect_except_customers,
    "region_event_grid": q_region_event_grid,
    "acctbal_buckets": q_acctbal_buckets,
    "top_docs_by_chars": q_top_docs_by_chars,
    "top_words": q_top_words,
    "part_brand_stats": q_part_brand_stats,
    "supplier_nation": q_supplier_nation,
    "sessionize_events": q_sessionize_events,
    "order_price_quantiles": q_order_price_quantiles,
    "props_map": q_props_map,
    "approx_distinct_users": q_approx_distinct_users,
    "sample_events": q_sample_events,
}
