"""Driver contract for the spark-graft builder (PySpark target).

queries() = the implemented operator surface (SURVEY.md §2 parity +
north-star pipeline ops), each with an exact DuckDB oracle twin in
oracle_sql(). Numeric determinism strategy: money sums go through
DECIMAL casts (exact in both engines), double-valued scores/ratios are
rounded; time keys are emitted as formatted strings so engine
timestamp-repr differences can't affect the value hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_iceberg_spark import iceberg_scan
from duckdb_iceberg_spark.functions import text as TX
from duckdb_iceberg_spark.functions.text import lang_id_sql
from duckdb_iceberg_spark.operators import dedup as DD
from duckdb_iceberg_spark.operators import multimodal as MM
from duckdb_iceberg_spark.operators import similarity as SIM

GEN2 = "/root/reference/data/iceberg/generated_spec2_0_001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long under nanosAsLong; truncate to
        # micros exactly like DuckDB does.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _dec(c, p: int = 18, s: int = 2):
    return F.col(c).cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary on sf0.001."""
    return _q1_pricing_summary(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# relational surface (SURVEY.md §2B)
# ---------------------------------------------------------------------------


def _q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) * (F.lit(1) + _dec("l_tax"))).cast("decimal(38,6)").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(38,6)) AS sum_charge,
  ROUND(AVG(l_quantity), 4) AS avg_qty,
  ROUND(AVG(l_discount), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def _q3_shipping_priority(spark, sf):
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def _q5_local_supplier(spark, sf):
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("decimal(38,4)").alias("revenue"))
    )


_Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def _q6_revenue(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(38,4)").alias("revenue"))
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def _q10_returned_items(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def _join_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_JOIN_ANTI_SQL = "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"


def _join_semi(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_acctbal")


_JOIN_SEMI_SQL = """
SELECT c_custkey, c_acctbal FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def _join_left_outer_counts(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


_JOIN_LEFT_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey
"""


def _join_full_outer(spark, sf):
    cn = _t(spark, sf, "customer").groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    sn = _t(spark, sf, "supplier").groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


_JOIN_FULL_SQL = """
WITH cn AS (SELECT c_nationkey, COUNT(*) n_cust FROM customer GROUP BY c_nationkey),
     sn AS (SELECT s_nationkey, COUNT(*) n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
"""


def _join_broadcast_brand(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("l_extendedprice")).cast("decimal(38,2)").alias("brand_revenue"),
        )
    )


_JOIN_BCAST_SQL = """
SELECT p_brand, COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS brand_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand
"""


def _agg_global(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
        F.min("l_shipdate").cast("date").cast("string").alias("min_ship"),
        F.max("l_shipdate").cast("date").cast("string").alias("max_ship"),
        F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


_AGG_GLOBAL_SQL = """
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
  CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR) AS min_ship,
  CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR) AS max_ship,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_qty,
  ROUND(MIN(l_extendedprice), 2) AS min_price, ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
"""


def _agg_having(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("qty"))
        .where(F.col("n") > 60)
    )


_AGG_HAVING_SQL = """
SELECT l_suppkey, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 60
"""


def _agg_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("qty")
    )


_AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def _agg_cube(spark, sf):
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.sum(_dec("o_totalprice")).cast("decimal(38,2)").alias("total")
    )


_AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def _window_topn_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rk")
    )


_WIN_TOPN_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) WHERE rk <= 3
"""


def _window_running_sum(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("decimal(38,2)").alias("running_total"),
    )


_WIN_RUN_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DECIMAL(38,2)) AS running_total
FROM orders
"""


def _window_lag_delta(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(_dec("o_totalprice")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (_dec("o_totalprice") - F.coalesce(prev, _dec("o_totalprice"))).cast("decimal(38,2)").alias("delta_prev"),
    )


_WIN_LAG_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) - COALESCE(
    LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
    CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS delta_prev
FROM orders
"""


def _sort_topk(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice"))
        .limit(100)
    )


_SORT_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS l_extendedprice
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
"""


def _setop_union(spark, sf):
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return a.union(b).distinct()


_SETOP_UNION_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 400000
"""


def _setop_intersect(spark, sf):
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


_SETOP_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def _setop_except(spark, sf):
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct())


_SETOP_EXCEPT_SQL = """
SELECT c_custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def _distinct_pairs(spark, sf):
    return _t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def _explode_embedding(spark, sf):
    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 5)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "x")).select(
        "vec_id", (F.col("pos") + 1).alias("pos"), F.round(F.col("x").cast("double"), 6).alias("x")
    )


_EXPLODE_SQL = """
SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS x
FROM embeddings WHERE vec_id < 5
"""


def _string_funcs(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("prefix_upper"),
        F.length("text").alias("len"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
        F.substring_index("source", "c", -1).alias("src_tail"),
        F.regexp_replace("text", r"[aeiou]", "_").substr(1, 20).alias("devoweled"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
    )


_STRING_SQL = r"""
SELECT doc_id,
  UPPER(SUBSTRING(text, 1, 12)) AS prefix_upper,
  LENGTH(text) AS len,
  LEN(regexp_split_to_array(TRIM(text), '\s+')) AS n_words,
  CASE WHEN POSITION('c' IN source) > 0
       THEN regexp_extract(source, 'c([^c]*)$', 1) ELSE source END AS src_tail,
  SUBSTRING(REGEXP_REPLACE(text, '[aeiou]', '_', 'g'), 1, 20) AS devoweled,
  CONCAT_WS('|', lang, source) AS lang_src
FROM documents
"""


def _date_funcs(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.dayofweek("ts").alias("dow"),
        )
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


_DATE_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(dayofweek(ts) + 1 AS INT) AS dow,
       COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def _events_hourly(spark, sf):
    from duckdb_iceberg_spark.streaming.events import hourly_rollup

    ev = _t(spark, sf, "events")
    out = hourly_rollup(ev)
    return out.select(
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        _dec("sum_value").cast("decimal(38,2)").alias("sum_value"),
    )


_EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(value), 2) AS DECIMAL(38,2)) AS sum_value
FROM events GROUP BY 1, 2
"""


def _events_sessionize(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.when(prev.isNull() | ((F.col("ts").cast("double") - prev.cast("double")) > 1800.0), 1).otherwise(0)
    return (
        ev.select("user_id", gap.alias("new_session"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("new_session").alias("n_sessions"))
    )


_EVENTS_SESSION_SQL = """
WITH x AS (
  SELECT user_id,
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, COUNT(*) AS n_events, SUM(new_session) AS n_sessions FROM x GROUP BY user_id
"""


def _events_json(spark, sf):
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.sum(_dec("value")).cast("decimal(38,2)").alias("sum_value"))
    )


_EVENTS_JSON_SQL = """
SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_value
FROM events GROUP BY 1
"""


def _events_pivot(spark, sf):
    ev = _t(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select("user_id", *[F.col(t).alias(f"n_{t}") for t in types])
    )


_EVENTS_PIVOT_SQL = """
SELECT user_id,
  COUNT(*) FILTER (event_type = 'click') AS n_click,
  COUNT(*) FILTER (event_type = 'error') AS n_error,
  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (event_type = 'signup') AS n_signup,
  COUNT(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def _case_bucketing(spark, sf):
    o = _t(spark, sf, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket"), "o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(_dec("o_totalprice")).cast("decimal(38,2)").alias("total"),
    )


_CASE_SQL = """
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium' ELSE 'large' END AS bucket,
       o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# text analysis / dedup / similarity (north-star pipeline ops)
# ---------------------------------------------------------------------------


def _text_tokens(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_ws_tokens"),
        TX.regex_token_count(F.col("text")).alias("n_re_tokens"),
        TX.stopword_count(F.col("text")).alias("n_stopwords"),
        TX.punct_count(F.col("text")).alias("n_punct"),
    )


_TEXT_TOKENS_SQL = rf"""
SELECT doc_id,
  LEN(regexp_split_to_array(TRIM(text), '\s+')) AS n_ws_tokens,
  LEN(regexp_extract_all(LOWER(text), '{TX.TOKEN_PATTERN}')) AS n_re_tokens,
  LEN(regexp_extract_all(LOWER(text), '\b({"|".join(TX.STOPWORDS)})\b')) AS n_stopwords,
  LEN(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct
FROM documents
"""


def _text_quality(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


_TEXT_QUALITY_SQL = rf"""
WITH m AS (
  SELECT doc_id,
    CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS DOUBLE) AS n_tok,
    CAST(LENGTH(text) AS DOUBLE) AS n_char,
    CAST(LEN(regexp_extract_all(LOWER(text), '\b({"|".join(TX.STOPWORDS)})\b')) AS DOUBLE) AS n_stop,
    CAST(LEN(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) AS n_punct
  FROM documents)
SELECT doc_id,
  FLOOR((0.4 * LEAST(n_tok / 64.0, 1.0)
      + 0.3 * LEAST(n_stop / GREATEST(n_tok, 1.0) * 4, 1.0)
      + 0.3 * (1.0 - LEAST(n_punct / GREATEST(n_char, 1.0) * 4, 1.0))) * 10000) / 10000 AS quality
FROM m
"""


def _text_langid(spark, sf):
    d = _t(spark, sf, "documents")
    pred = TX.lang_id(F.col("text"))
    return d.select("doc_id", pred.alias("pred_lang"), (pred == F.col("lang")).alias("is_match"))


_TEXT_LANGID_SQL = f"""
SELECT doc_id, {lang_id_sql('text')} AS pred_lang,
       ({lang_id_sql('text')}) = lang AS is_match
FROM documents
"""


def _text_fingerprint(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(TX.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"))
    )


_TEXT_FP_SQL = r"""
SELECT md5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))) AS fp, COUNT(*) AS n
FROM documents GROUP BY 1
"""


def _dedup_exact(spark, sf):
    d = _t(spark, sf, "documents")
    return DD.exact_dedup(d).select("doc_id", "source")


_DEDUP_EXACT_SQL = r"""
SELECT doc_id, source FROM documents
WHERE doc_id IN (
  SELECT MIN(doc_id) FROM documents
  GROUP BY md5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))))
"""


def _dedup_minhash_sig(spark, sf):
    d = _t(spark, sf, "documents")
    sig = DD.minhash_signatures(d, num_perm=16)
    return sig.select("doc_id", F.md5(F.concat_ws("|", *[f"h{i}" for i in range(16)])).alias("sig_digest"))


_DEDUP_MINHASH_SQL = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS tok
  FROM documents),
sig AS (
  SELECT doc_id, p.i,
         MIN(md5(CAST(p.i AS VARCHAR) || ':' || tok)) AS h
  FROM toks, (SELECT unnest(generate_series(0, 15)) AS i) p
  GROUP BY doc_id, p.i)
SELECT doc_id, md5(string_agg(h, '|' ORDER BY i)) AS sig_digest
FROM sig GROUP BY doc_id
"""


def _dedup_jaccard(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return DD.jaccard_pairs(d, threshold=0.9, max_doc_freq=10**9)


_DEDUP_JACCARD_SQL = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS tok
  FROM documents WHERE doc_id < 300),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
  FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, ROUND(i / (a.sz + b.sz - i), 4) AS jaccard
FROM inter JOIN sizes a ON id_a = a.doc_id JOIN sizes b ON id_b = b.doc_id
WHERE ROUND(i / (a.sz + b.sz - i), 4) >= 0.9
"""


def _sim_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return SIM.cosine_topk(e.filter(F.col("vec_id") > 0), q, k=10)


_SIM_TOPK_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qx AS (SELECT generate_subscripts(qv, 1) AS i, CAST(unnest(qv) AS DOUBLE) AS x FROM q),
ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
       FROM embeddings WHERE vec_id > 0),
dots AS (
  SELECT e.vec_id, SUM(e.x * qx.x) AS dot, SUM(e.x * e.x) AS n2
  FROM ex e JOIN qx ON e.i = qx.i GROUP BY e.vec_id),
qn AS (SELECT SUM(x * x) AS qn2 FROM qx)
SELECT vec_id, ROUND(dot / (SQRT(n2) * SQRT(qn2)), 4) AS cos
FROM dots, qn ORDER BY cos DESC, vec_id LIMIT 10
"""


def _sim_neardup(spark, sf):
    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 300)
    # exact within the subset: LSH with 0 planes = single bucket
    return DD.embedding_neardup_pairs(e, threshold=0.3, n_planes=0)


_SIM_NEARDUP_SQL = """
WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings WHERE vec_id < 300),
norms AS (SELECT vec_id, SUM(x * x) AS n2 FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.x * b.x) AS dot
  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2)
SELECT id_a, id_b, ROUND(dot / (SQRT(na.n2) * SQRT(nb.n2)), 4) AS cos
FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
WHERE ROUND(dot / (SQRT(na.n2) * SQRT(nb.n2)), 4) >= 0.3
"""


def _mm_frame_sample(spark, sf):
    d = _t(spark, sf, "documents")
    media = MM.synth_media(d)
    return MM.frame_sample(media, every_ms=1000)


_MM_FRAME_SQL = """
SELECT doc_id AS media_id, unnest(generate_series(0, n_chars * 10, 1000)) AS frame_ts_ms
FROM documents WHERE doc_id % 3 = 2
"""


# -- rows-only entries (non-SQL-expressible: LSH internals, stateful
#    streaming, Arrow-batched python stages) --------------------------------


def _dedup_minhash_pairs(spark, sf):
    d = _t(spark, sf, "documents")
    return DD.minhash_lsh_pairs(d, num_perm=16, bands=4, threshold=0.5)


def _dedup_simhash_pairs(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return DD.simhash_pairs(d, max_hamming=3)


def _ann_lsh_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return SIM.lsh_topk(e.filter(F.col("vec_id") > 0), q, k=10, n_planes=4, probe_hamming=2)


def _knn_join(spark, sf):
    e = _t(spark, sf, "embeddings")
    left = e.filter(F.col("vec_id") < 20)
    return SIM.knn_join(left, e.filter(F.col("vec_id") >= 20), k=5)


def _mm_features(spark, sf):
    d = _t(spark, sf, "documents")
    return MM.extract_features(MM.synth_media(d))


def _streaming_hourly(spark, sf):
    from duckdb_iceberg_spark.streaming.events import (
        hourly_rollup,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, sf)
    out = run_stream_to_memory(hourly_rollup(stream), "stream_hourly_entry")
    return out.select(
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        _dec("sum_value").cast("decimal(38,2)").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# iceberg parity entries
# ---------------------------------------------------------------------------

_ICE_COLS = ["uuid", "l_partkey_int", "l_suppkey_long", "l_extendedprice_double", "schema_evol_added_col_1"]


def _iceberg_scan_generated(spark, sf):
    df = iceberg_scan(spark, f"{GEN2}/pyspark_iceberg_table", allow_moved_paths=True)
    return df.select(*_ICE_COLS)


_ICEBERG_SCAN_SQL = f"""
SELECT {", ".join(_ICE_COLS)}
FROM read_parquet('{GEN2}/expected_results/last/data/*.parquet')
"""


def _iceberg_snapshots_q(spark, sf):
    from duckdb_iceberg_spark import iceberg_snapshots

    df = iceberg_snapshots(spark, "/root/reference/data/iceberg/lineitem_iceberg")
    return df.select(
        "sequence_number",
        "snapshot_id",
        F.date_format("timestamp_ms", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        F.substring_index("manifest_list", "/", -1).alias("manifest_file"),
    )


_ICEBERG_SNAPSHOTS_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), CAST(3776207205136740581 AS BIGINT), '2023-02-15 15:07:54.504',
   'snap-3776207205136740581-1-cf3d0be5-cf70-453d-ad8f-48fdc412e608.avro'),
  (CAST(2 AS BIGINT), CAST(7635660646343998149 AS BIGINT), '2023-02-15 15:08:14.730',
   'snap-7635660646343998149-1-10eaca8a-1e1c-421e-ad6d-b232e5ee23d3.avro')
) AS t(sequence_number, snapshot_id, ts, manifest_file)
"""


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # TPC-H-style relational
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "q5_local_supplier": _q5_local_supplier,
        "q6_revenue": _q6_revenue,
        "q10_returned_items": _q10_returned_items,
        # joins
        "join_anti": _join_anti,
        "join_semi": _join_semi,
        "join_left_outer_counts": _join_left_outer_counts,
        "join_full_outer": _join_full_outer,
        "join_broadcast_brand": _join_broadcast_brand,
        # aggregation
        "agg_global": _agg_global,
        "agg_having": _agg_having,
        "agg_rollup": _agg_rollup,
        "agg_cube": _agg_cube,
        # window functions
        "window_topn_per_group": _window_topn_per_group,
        "window_running_sum": _window_running_sum,
        "window_lag_delta": _window_lag_delta,
        # sort / limit / set ops / distinct
        "sort_topk": _sort_topk,
        "setop_union": _setop_union,
        "setop_intersect": _setop_intersect,
        "setop_except": _setop_except,
        "distinct_pairs": _distinct_pairs,
        # semi-structured / arrays / strings / dates
        "explode_embedding": _explode_embedding,
        "string_funcs": _string_funcs,
        "date_funcs": _date_funcs,
        "events_hourly": _events_hourly,
        "events_sessionize": _events_sessionize,
        "events_json": _events_json,
        "events_pivot": _events_pivot,
        "case_bucketing": _case_bucketing,
        # text analysis
        "text_tokens": _text_tokens,
        "text_quality": _text_quality,
        "text_langid": _text_langid,
        "text_fingerprint": _text_fingerprint,
        # dedup
        "dedup_exact": _dedup_exact,
        "dedup_minhash_sig": _dedup_minhash_sig,
        "dedup_jaccard": _dedup_jaccard,
        "dedup_minhash_pairs": _dedup_minhash_pairs,  # rows-only
        "dedup_simhash_pairs": _dedup_simhash_pairs,  # rows-only
        # similarity search
        "sim_topk": _sim_topk,
        "sim_neardup": _sim_neardup,
        "ann_lsh_topk": _ann_lsh_topk,  # rows-only
        "knn_join": _knn_join,  # rows-only
        # multimodal
        "mm_frame_sample": _mm_frame_sample,
        "mm_features": _mm_features,  # rows-only
        # streaming
        "streaming_hourly": _streaming_hourly,  # rows-only
        # iceberg parity
        "iceberg_scan_generated": _iceberg_scan_generated,
        "iceberg_snapshots": _iceberg_snapshots_q,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": _Q1_SQL,
        "q3_shipping_priority": _Q3_SQL,
        "q5_local_supplier": _Q5_SQL,
        "q6_revenue": _Q6_SQL,
        "q10_returned_items": _Q10_SQL,
        "join_anti": _JOIN_ANTI_SQL,
        "join_semi": _JOIN_SEMI_SQL,
        "join_left_outer_counts": _JOIN_LEFT_SQL,
        "join_full_outer": _JOIN_FULL_SQL,
        "join_broadcast_brand": _JOIN_BCAST_SQL,
        "agg_global": _AGG_GLOBAL_SQL,
        "agg_having": _AGG_HAVING_SQL,
        "agg_rollup": _AGG_ROLLUP_SQL,
        "agg_cube": _AGG_CUBE_SQL,
        "window_topn_per_group": _WIN_TOPN_SQL,
        "window_running_sum": _WIN_RUN_SQL,
        "window_lag_delta": _WIN_LAG_SQL,
        "sort_topk": _SORT_TOPK_SQL,
        "setop_union": _SETOP_UNION_SQL,
        "setop_intersect": _SETOP_INTERSECT_SQL,
        "setop_except": _SETOP_EXCEPT_SQL,
        "distinct_pairs": _DISTINCT_SQL,
        "explode_embedding": _EXPLODE_SQL,
        "string_funcs": _STRING_SQL,
        "date_funcs": _DATE_SQL,
        "events_hourly": _EVENTS_HOURLY_SQL,
        "events_sessionize": _EVENTS_SESSION_SQL,
        "events_json": _EVENTS_JSON_SQL,
        "events_pivot": _EVENTS_PIVOT_SQL,
        "case_bucketing": _CASE_SQL,
        "text_tokens": _TEXT_TOKENS_SQL,
        "text_quality": _TEXT_QUALITY_SQL,
        "text_langid": _TEXT_LANGID_SQL,
        "text_fingerprint": _TEXT_FP_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_minhash_sig": _DEDUP_MINHASH_SQL,
        "dedup_jaccard": _DEDUP_JACCARD_SQL,
        "sim_topk": _SIM_TOPK_SQL,
        "sim_neardup": _SIM_NEARDUP_SQL,
        "mm_frame_sample": _MM_FRAME_SQL,
        "iceberg_scan_generated": _ICEBERG_SCAN_SQL,
        "iceberg_snapshots": _ICEBERG_SNAPSHOTS_SQL,
    }
