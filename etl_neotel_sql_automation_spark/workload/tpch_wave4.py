"""Fourth TPC-H wave — the last shapes expressible on the simplified
star schema (no partsupp table, no commit/receipt dates): q8
market-share (conditional-ratio aggregate over a 6-table star) and q21
waiting-supplier (EXISTS + NOT EXISTS correlated on the same fact).

Scale notes (100 TB posture):

- q8 joins lineitem against part/orders/customer/supplier without
  pinned broadcasts — the selective ``p_type`` filter makes ``part``
  broadcast-able and AQE picks that up from runtime stats; nation and
  region (fixed 25/5 rows) are hinted. The two-level aggregate
  (per-year conditional ratio) is one shuffle on ``o_year``.
- q21 decorrelates both EXISTS and NOT EXISTS into per-order
  aggregates over a single scan of lineitem (count of distinct
  suppliers, count of distinct late suppliers), replacing two
  correlated self-joins with ONE groupBy — at 100 TB that is one
  shuffle of (orderkey, 2 longs) instead of two fact-fact self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table


@query(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT CAST(year(o_orderdate) AS INT)            AS o_year,
             l_extendedprice * (1 - l_discount)        AS volume,
             n2.n_name                                 AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND p_type LIKE 'PROM%'
    )
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END), 4)
             AS nation_volume,
           round(sum(volume), 4)                        AS total_volume,
           round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume), 6)                      AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: national market share = conditional sum / total
    sum per order-year, over a customer-region / supplier-nation star.
    Exercises the two-level aggregate-of-ratio pattern (a single
    groupBy with two conditional aggregates — NOT an agg-then-join).
    Parity target: SURVEY.md §2.4 multi-agg + §2.3 multi-way star."""
    part = table(spark, sf_dir, "part").filter(F.col("p_type").startswith("PROM"))
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    brazil = F.when(F.col("n2.n_name") == "NATION_7", vol).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(reg), F.col("n1.n_regionkey") == reg.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(brazil), 4).alias("nation_volume"),
            F.round(F.sum(vol), 4).alias("total_volume"),
            F.round(F.sum(brazil) / F.sum(vol), 6).alias("mkt_share"),
        )
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_supp AS (
      SELECT l_orderkey, l_suppkey, max(late) AS supp_late
      FROM l GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey,
             count(*)           AS n_supps,
             sum(supp_late)     AS n_late_supps
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM per_supp
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE supp_late = 1 AND n_supps > 1 AND n_late_supps = 1
      AND n_name = 'NATION_5'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (EXISTS + NOT EXISTS correlated on the same
    fact), adapted: a supplier "kept an order waiting" when it was the
    ONLY late supplier (ship > order date + 90d) on a multi-supplier
    finalized order. The classic formulation is two correlated
    self-joins on lineitem; this decorrelates both into one per-(order,
    supplier) aggregate followed by one per-order aggregate — a single
    shuffle pipeline that scales where the self-join formulation
    shuffles the fact twice. Parity target: SURVEY.md §2.3 semi/anti
    join family."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")

    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("supp_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"), F.sum("supp_late").alias("n_late_supps")
    )
    return (
        per_supp.join(per_order, "l_orderkey")
        .filter(
            (F.col("supp_late") == 1)
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1)
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
