"""Third TPC-H wave, adapted to the simplified star schema (no
partsupp/phone/comment columns): q13 left-join distribution, q15
scalar-subquery argmax, q17 correlated-average filter, q18 HAVING
top-k, q22 anti-join with a scalar-subquery threshold.

Scale notes: every scalar subquery becomes a 1-row aggregate
cross-joined in (a broadcast of one row — always safe); correlated
subqueries decorrelate into aggregate + equi-join; no pinned
broadcasts of SF-scaled tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table


@query(
    "q13_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: LEFT JOIN with an extra join-predicate filter, then a
    distribution over per-customer counts (customers with zero matching
    orders must appear with c_count = 0 — the left join is load-bearing)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: revenue view + scalar-subquery max. The max is a
    1-row aggregate broadcast back over the view — two passes over the
    supplier-sized aggregate, zero passes over lineitem beyond the
    first. Revenue is rounded BEFORE the max-equality so the selection
    boundary sits on a 4-decimal grid in both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: correlated per-part average, decorrelated manually
    into a part-keyed aggregate + equi-join (what Catalyst would do to
    the SQL form) — no per-row re-aggregation. Quantities sit on an
    integer grid so the 0.2*avg threshold comparison is stable."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE),
             round(o_totalprice, 2)
    HAVING sum(l_quantity) > 250
    ORDER BY round(o_totalprice, 2) DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: aggregate-then-filter (HAVING) with deterministic
    top-k. Quantity sums are integer-valued doubles, so the >250
    threshold is exact in both engines."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "scalar_fuzzy_funcs",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_name, translate(c_name, '0', 'O')) AS INTEGER)
               AS dist_zero_oh,
           CAST(levenshtein(c_name, reverse(c_name)) AS INTEGER) AS dist_rev,
           reverse(c_name)                         AS name_rev,
           translate(c_name, '#0', '_x')           AS name_translated,
           repeat(left(c_name, 2), 2)              AS name_rep,
           CAST(contains(c_name, '00') AS BOOLEAN) AS has_double_zero
    FROM customer WHERE c_custkey % 9 = 0
    """,
)
def scalar_fuzzy_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy/string-edit scalar parity — the engine surface behind
    agent-name matching (the reference cleans and matches free-text
    names): levenshtein edit distance, translate, reverse, repeat,
    substring-contains. All codegen'd expressions, scan-side."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 9 == 0)
    name = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.levenshtein(name, F.translate(name, "0", "O")).cast("int").alias("dist_zero_oh"),
        F.levenshtein(name, F.reverse(name)).cast("int").alias("dist_rev"),
        F.reverse(name).alias("name_rev"),
        F.translate(name, "#0", "_x").alias("name_translated"),
        F.repeat(F.substring(name, 1, 2), 2).alias("name_rep"),
        name.contains("00").alias("has_double_zero"),
    )


@query(
    "q22_lapsed_balance",
    oracle="""
    WITH ab AS (SELECT avg(c_acctbal) AS avg_bal FROM customer
                WHERE c_acctbal > 0.0)
    SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, ab
    WHERE c_acctbal > ab.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY CAST(c_nationkey % 10 AS INTEGER)
    """,
)
def q22_lapsed_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: scalar-subquery threshold (1-row aggregate broadcast)
    + anti join (above-average-balance customers with no urgent
    orders; the unfiltered variant is empty on this data) + group-agg.
    cntrycode is derived from nationkey (the schema has no phone
    column)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
