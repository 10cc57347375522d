"""Fifth TPC-H wave — the five shapes whose classic formulations need
``partsupp`` (q2, q9, q11, q16, q20), re-derived on the simplified
schema: the part-supplier "offer" relation is distilled from lineitem
(distinct (l_partkey, l_suppkey) pairs, unit price = extendedprice /
quantity) and supply cost is proxied as a fixed fraction of
``p_retailprice``. What matters here is the OPERATOR shapes these
queries exercise, which the registry otherwise lacks:

- q2: correlated-min subquery decorrelated into aggregate + re-join on
  the min value (the "argmin rows per group via self-join" pattern).
- q9: multi-way star with an arithmetic measure spanning three tables,
  grouped by two derived dimensions.
- q11: HAVING against a global scalar aggregate (group value > fraction
  of total) — a broadcast of ONE row against a grouped relation.
- q16: NOT IN pushed down as a broadcast anti-join + count(DISTINCT)
  over de-duplicated fact pairs.
- q20: two nested semi-joins driven by a correlated aggregate
  threshold, fully decorrelated into agg -> filter -> semi chains.

Scale notes (100 TB posture):

- Every query aggregates lineitem FIRST (partial aggregates map-side)
  and joins the collapsed result against dimensions — the fact table is
  shuffled at most once, on its natural key.
- The only pinned broadcasts are fixed-cardinality ``nation`` /
  ``region``; customer/supplier/part are left to AQE, which broadcasts
  the post-filter side only while it actually fits.
- q11's scalar total is a 1-row cross join (broadcast by construction);
  the grouped relation streams past it without a shuffle.
- Floating-point sums ride on integer micro-units (round(x*1e6) as
  bigint) where a threshold comparison could flip on summation order;
  plain double sums are kept only where inputs are integral (exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query, table

# Proxy supply cost: a fixed, deterministic fraction of retail price
# (the testdata has no partsupp.ps_supplycost to read).
_COST_FRACTION = 0.6


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    eu_offers AS (
      SELECT o.l_partkey, o.unit_cost, s_name, s_acctbal, n_name
      FROM offers o
      JOIN supplier ON o.l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey, min(unit_cost) AS min_cost
      FROM eu_offers GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           round(e.unit_cost * 1e4) / 1e4 AS unit_cost
    FROM eu_offers e
    JOIN best USING (l_partkey)
    JOIN part ON e.l_partkey = p_partkey
    WHERE e.unit_cost = best.min_cost
      AND p_type = 'LARGE' AND p_size <= 12
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering the minimum unit cost. The classic correlated
    ``WHERE ps_supplycost = (SELECT min(...))`` is decorrelated into a
    per-part WINDOW min + filter rather than an aggregate re-joined on
    equality: the agg+re-join form duplicates the offer subtree in the
    DAG (lineitem scanned and shuffled twice unless AQE happens to
    reuse the stage), while the window form is one pass with a single
    extra shuffle on the window key. The min comparison is exact: both
    engines derive unit_cost from the same IEEE division, and min
    picks (never combines) values. Parity target: SURVEY.md §2.3 join
    family + §2.5 windows."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 12)
    )

    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu_offers = (
        offers.join(supp, offers.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    min_cost = F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    return (
        eu_offers.withColumn("min_cost", min_cost)
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            # integer-level round (then exact same double division on
            # both sides): fractional round(x, 4) hits a multiply-tie
            # between Spark's BigDecimal HALF_UP and DuckDB's re-scaled
            # round at sf0.1 — see BUILDLOG round lessons
            (F.round(F.col("unit_cost") * 1e4, 0) / 1e4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(CAST(round((l_extendedprice * (1 - l_discount)
                 - {_COST_FRACTION} * p_retailprice * l_quantity) * 1e6)
                 AS BIGINT)) / 1e6, 4) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit per supplier-nation per order-year over a
    5-table star, with supply cost proxied as a retail-price fraction
    (no partsupp in the schema). Profit per line can be negative, so
    the sum is taken over integer micro-units — exact under any
    summation order, which a plain double sum across 32 partitions is
    not. Parity target: SURVEY.md §2.4 multi-agg over §2.3 star."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nat = table(spark, sf_dir, "nation")

    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(_COST_FRACTION) * F.col("p_retailprice") * F.col("l_quantity")
    )
    micro = F.round(amount * 1e6, 0).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(micro) / 1e6, 4).alias("profit"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e6)
                 AS BIGINT)) AS value_micro
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           round(value_micro / 1e6, 4) AS part_value
    FROM v
    WHERE value_micro > 2.0 * (SELECT sum(value_micro) FROM v)
                            / (SELECT count(*) FROM v)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: parts whose supplied value (from one nation's
    suppliers) exceeds a fraction of the GLOBAL total — a grouped
    relation filtered against a scalar aggregate of itself. The naive
    form (v cross-join v.agg(sum)) plans the fact join + aggregate
    TWICE (no exchange reuse: the two subtrees differ). Instead, ONE
    ``GROUPING SETS ((l_partkey), ())`` pass computes per-part values
    and the global total together — the map-side expand doubles rows
    but partial aggregation collapses the ()-group to one row per
    task, so the total-group reducer receives #tasks rows, not the
    fact. The 1-row total slice is then broadcast back over the
    per-part slice; the duplicated agg subtree shares one identical
    shuffle exchange, which Spark's ReuseExchange deduplicates.
    Values are summed in integer micro-units so the threshold
    comparison cannot flip on double summation order. Parity target:
    SURVEY.md §2.4 grouping sets + scalar-subquery HAVING.

    The importance threshold is DATA-DERIVED — 2x the mean per-part
    value, with the part count computed in the same ()-slice — because
    any fixed fraction thins to an EMPTY result as the catalog grows
    (TPC-H itself scales q11's fraction as 0.0001/SF for the same
    reason): the r4 nonzero-row floor caught exactly that at sf0.1,
    where the old fixed 0.001 returned 0 rows against an equally-empty
    oracle. 2x-mean is scale-stable: both engines compare the BIGINT
    micro value against the identical IEEE-double 2*total/n."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")

    micro = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6, 0
    ).cast("long")
    ga = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .withColumn("m", micro)
        .groupingSets([["l_partkey"], []], "l_partkey")
        .agg(
            F.sum("m").alias("value_micro"),
            # in the ()-slice this counts the distinct parts (|v|);
            # aggregate exprs see original values, only grouping keys
            # are null-extended by the expand
            F.countDistinct("l_partkey").alias("n_parts"),
            F.grouping_id().alias("gid"),
        )
    )
    per_part = ga.filter(F.col("gid") == 0).select("l_partkey", "value_micro")
    total = ga.filter(F.col("gid") == 1).select(
        F.col("value_micro").alias("total_micro"), "n_parts"
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_micro") > 2.0 * F.col("total_micro") / F.col("n_parts")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_micro") / 1e6, 4).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM pairs
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: distinct supplier count per part attribute
    triple, excluding "complaint" suppliers (negative balance proxies
    the classic comment scan) via NOT IN. None of the excluded keys are
    null, so NOT IN ≡ LEFT ANTI join; the excluded set is a filtered
    slice of supplier (grows with SF), so it is NOT pinned — AQE
    broadcasts it while it fits. The fact is first de-duplicated to
    (partkey, suppkey) pairs — partial distinct map-side — so the join
    and count(DISTINCT) run on the collapsed pair relation, not raw
    lineitem. Parity target:
    SURVEY.md §2.3 anti join + §2.4 distinct agg."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)

    pairs = li.select("l_partkey", "l_suppkey").distinct()
    # No pinned broadcast: the excluded set is a filtered slice of
    # supplier, which grows with scale factor — AQE broadcasts it
    # while it fits and falls back to a shuffled anti join when not.
    return (
        pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    WITH promo_parts AS (
      SELECT p_partkey FROM part WHERE p_type = 'PROMO'
    ),
    shipped AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM promo_parts)
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 40)
    ORDER BY s_name
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: EUROPE suppliers who moved an "excess" volume
    (> 40 units to one part) of PROMO parts in 1997 — two nested IN
    subqueries, each decorrelated: parts filter -> semi join into the
    fact, per-(supplier, part) aggregate -> threshold filter -> semi
    join into supplier. l_quantity is integral in this dataset, so the
    double sum is exact under any partitioning. Parity target:
    SURVEY.md §2.3 semi-join chain + §2.4 agg-driven filter."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    promo = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    shipped = (
        li.join(
            promo.select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
    )
    return (
        supp.join(
            shipped.select("l_suppkey"),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
