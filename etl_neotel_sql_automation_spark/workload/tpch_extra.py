"""TPC-H-shaped extras: q4 (EXISTS + count), q12 (conditional CASE
buckets), q14 (ratio of conditional aggregates), plus null-handling
scalar functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q12_priority_buckets",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of conditional sums (scalar result). The ratio is dominated
    by its numerator/denominator magnitudes, so round-6 of the quotient
    is stable (no decimal-grid issue: quotients leave the grid)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"))
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, round(o_totalprice * 1.1, 4) AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    survivors AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 0
    )
    SELECT * FROM survivors UNION ALL SELECT * FROM updates
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation (anti-join + union) applied to a CDC-style update
    batch; the oracle computes the expected post-merge table directly."""
    from ..ops.merge import upsert

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 4).alias("o_totalprice")
    )
    updates = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
        )
    )
    return upsert(orders, updates, "o_orderkey")


@query(
    "scalar_null_funcs",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING')                    AS seg_or_null,
           COALESCE(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_defaulted,
           CAST(c_acctbal < 0 AS BOOLEAN)                      AS in_debt,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL
                THEN NULL ELSE round(c_acctbal, 2) END         AS bal_non_building
    FROM customer WHERE c_custkey % 4 = 0
    """,
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: nullif, coalesce, null-propagating CASE
    (the engine's coercion semantics, §2.8, exercised as data ops)."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 4 == 0)
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return cust.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("OTHER")).alias("seg_defaulted"),
        (F.col("c_acctbal") < 0).alias("in_debt"),
        F.when(seg_null.isNull(), F.lit(None)).otherwise(F.round("c_acctbal", 2)).alias(
            "bal_non_building"
        ),
    )
