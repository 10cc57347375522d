"""Relational operator workloads (SURVEY.md §2.3-2.8): joins of every
flavor, aggregations, windows, sorts/top-k, set ops, scalar functions.

Scale notes: only FIXED-cardinality dimensions (``region``: 5 rows,
``nation``: 25 — constant at every scale factor) carry an explicit
``broadcast()`` hint. Tables that grow with the scale factor
(``customer``/``supplier``/``part``) are left unhinted: at bench scale
Catalyst's size statistics (and AQE at runtime) still choose a
broadcast join, but at 100 TB the optimizer keeps the freedom to fall
back to a shuffled join instead of OOMing on a pinned broadcast.
Aggregations rely on Spark's partial (map-side) aggregation; windows
partition on their natural key. Every top-k ORDER BY carries a unique
tiebreak so LIMIT boundaries are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table

# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1 shape — the flagship scan+agg
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4))
                                                                       AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(38,6))
                                                                       AS sum_charge,
           round(avg(l_quantity), 6)                                   AS avg_qty,
           round(avg(l_extendedprice), 6)                              AS avg_price,
           round(avg(l_discount), 6)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # exact decimal arithmetic for the high-magnitude product sums:
    # sum_charge needs 19 significant digits at sf0.1+ — beyond double —
    # so both engines must sum exactly to agree (monetary inputs are on
    # a 2-decimal grid, making the decimal cast lossless)
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_d = F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    tax_d = F.lit(1) + F.col("l_tax").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(ep * disc_d).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(ep * disc_d * tax_d).cast("decimal(38,6)").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Join + agg + top-k: TPC-H Q3 shape
# --------------------------------------------------------------------------


@query(
    "q3_top_unshipped",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE)                         AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-way star join: TPC-H Q5 shape
# --------------------------------------------------------------------------


@query(
    "q5_region_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "flagship_region_revenue",
    oracle="""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def flagship_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unfiltered star join -> per-nation revenue. The entry() smoke
    query: returns ~25 rows at every scale factor."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins
# --------------------------------------------------------------------------


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "join_anti_no_recent_orders",
    oracle="""
    SELECT n_name, count(*) AS n_customers
    FROM customer c
    JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
)
def join_anti_no_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    nat = table(spark, sf_dir, "nation")
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Distinct aggregation / rollup / cube
# --------------------------------------------------------------------------


@query(
    "agg_distinct_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*)                   AS n_orders,
           count(DISTINCT o_custkey)  AS n_customers,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "agg_rollup_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "agg_cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"), F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "window_running_supplier",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-02-01 00:00:00'
    """,
)
def window_running_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per supplier — the ``t_diario_*`` daily-cumulative
    shape from the reference's estados table (SURVEY.md §2.5)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-02-01 00:00:00").cast("timestamp"))
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


@query(
    "window_topk_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_topk_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_gap",
    oracle="""
    SELECT user_id, event_id,
           round(COALESCE(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6) AS delta
    FROM events
    WHERE user_id < 50
    """,
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.round(
                F.coalesce(F.col("value") - F.lag("value").over(w), F.lit(0.0)), 6
            ).alias("delta"),
        )
    )


# --------------------------------------------------------------------------
# Sort / top-k / set ops
# --------------------------------------------------------------------------


@query(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "set_intersect_repeat_buyers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def set_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def bought_in(year: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))

    return bought_in(1996).intersect(bought_in(1997))


@query(
    "set_except_lapsed_buyers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def set_except_lapsed_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    before = orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    after = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    return before.subtract(after)  # EXCEPT (distinct) semantics


# --------------------------------------------------------------------------
# Scalar string / date / JSON functions
# --------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                     AS name_upper,
           CAST(length(c_name) AS INTEGER)   AS name_len,
           substr(n_name, 1, 3)              AS nation_abbr,
           concat(c_mktsegment, '/', n_name) AS seg_nation
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey <= 200
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    nat = table(spark, sf_dir, "nation")
    return cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("n_name", 1, 3).alias("nation_abbr"),
        F.concat_ws("/", "c_mktsegment", "n_name").alias("seg_nation"),
    )


@query(
    "subquery_above_nation_avg",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery via the SQL API — Catalyst
    decorrelates it into an aggregate + join; no per-row re-execution."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM customer_sq c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_sq c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)              AS y,
           CAST(month(o_orderdate) AS INTEGER)             AS m,
           CAST(day(o_orderdate) AS INTEGER)               AS d,
           CAST(date_trunc('month', o_orderdate) AS DATE)  AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE)     AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INTEGER)                                AS days_since_epoch_start
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.last_day(od.cast("date")).alias("month_end"),
        F.date_add(od.cast("date"), 90).alias("due_date"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@query(
    "json_events_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count("*").alias("n")
    )


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k,
           CAST(min(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
             AS min_k,
           CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
             AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: the JSON
    column is parsed ONCE into the binary variant encoding
    (``try_parse_json`` — malformed rows become null, never a task
    failure), then every field access is a typed ``variant_get`` over
    the pre-parsed tree. At 100 TB this beats per-access
    ``get_json_object`` (which re-parses the string for every path)
    whenever more than one field is touched — here three accesses cost
    one parse. Same aggregate semantics as json_events_extract, so the
    two queries cross-check each other's extraction paths."""
    ev = table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("*").alias("n"),
    )


@query(
    "events_hourly_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the tumbling-window aggregation (streaming twin
    lives in ``streaming/``; same logical result via time bucketing)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
