"""Round-6 wave-22 workloads: composition and SQL-surface completion —
seasonally-adjusted anomaly detection (the wave-19 decomposition
APPLIED: remove trend and weekday pattern, then MAD-flag the residual
— a raw MAD monitor fires every Friday; this one only fires when a day
deviates from ITS OWN weekday's norm), the bag-semantics set operators
EXCEPT ALL / INTERSECT ALL (the registered set ops are DISTINCT-
semantics; bag semantics preserve multiplicity — Spark's
exceptAll/intersectAll against DuckDB's EXCEPT ALL/INTERSECT ALL — a
real §2.7 surface gap), and share-of-parent within the part hierarchy
(brand revenue as a share of its part type — the two-level drill
report plain rollup rows don't give you).

Determinism rules (house style): exact cents end-to-end in the
anomaly pipeline (the MAD threshold comparison is integer-exact);
set-op outputs carry full ORDER BY keys; shares in integer ppm.

Scale notes: the anomaly pipeline runs entirely over the bounded day
support after one daily aggregate; bag set ops are key-partitioned
(Spark plans them as aggregates over count-tagged rows); the
hierarchy report is a two-level combinable aggregate joined 25x5-way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# timeseries_seasonal_anomaly — compose wave-19's decomposition with a
# MAD gate: daily revenue -> centered 7-day trend -> weekday seasonal
# index (computed from the SAME series) -> residual = rev - trend -
# seasonal -> flag |residual - median| > 3 * MAD. Median/MAD are exact
# support-collapsed order statistics (lower-median convention: the
# value at CDF rank ceil(n/2)).
# ---------------------------------------------------------------------------


@query(
    "timeseries_seasonal_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    ma AS (
      SELECT day, rev,
             CAST(sum(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                 AND 3 FOLLOWING) AS BIGINT) AS w_sum,
             CAST(count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                 AND 3 FOLLOWING) AS BIGINT) AS w_n
      FROM daily
    ),
    det AS (
      SELECT day, rev, CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
             w_sum // 7 AS trend,
             rev - w_sum // 7 AS detrended
      FROM ma WHERE w_n = 7
    ),
    seas AS (
      SELECT dow, CAST(sum(detrended) // count(*) AS BIGINT) AS seasonal
      FROM det GROUP BY dow
    ),
    resid AS (
      SELECT det.day, det.rev, det.trend, seas.seasonal,
             det.detrended - seas.seasonal AS r
      FROM det JOIN seas USING (dow)
    ),
    rc AS (SELECT r AS v, CAST(count(*) AS BIGINT) AS c FROM resid GROUP BY r),
    rt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM rc),
    med AS (
      SELECT v AS m FROM (
        SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS hi FROM rc
      ) WHERE hi >= ((SELECT n FROM rt) + 1) // 2 ORDER BY v LIMIT 1
    ),
    dev AS (
      SELECT abs(r - (SELECT m FROM med)) AS d FROM resid
    ),
    dc AS (SELECT d AS v, CAST(count(*) AS BIGINT) AS c FROM dev GROUP BY d),
    mad AS (
      SELECT v AS m FROM (
        SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS hi FROM dc
      ) WHERE hi >= ((SELECT n FROM rt) + 1) // 2 ORDER BY v LIMIT 1
    )
    SELECT CAST((SELECT n FROM rt) AS BIGINT) AS n_days,
           CAST((SELECT m FROM med) AS BIGINT) AS resid_median_cents,
           CAST((SELECT m FROM mad) AS BIGINT) AS resid_mad_cents,
           CAST(sum(CASE WHEN abs(r - (SELECT m FROM med))
                              > 3 * (SELECT m FROM mad)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           CAST(max(CASE WHEN abs(r - (SELECT m FROM med))
                              > 3 * (SELECT m FROM mad)
                         THEN abs(r - (SELECT m FROM med)) END) AS BIGINT)
             AS worst_abs_dev_cents
    FROM resid
    """,
)
def timeseries_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted MAD anomaly gate on daily revenue: residual
    median/MAD (exact lower-median order statistics) and the anomaly
    count past 3 MAD."""
    return seasonal_anomaly_frame(table(spark, sf_dir, "orders"))


def seasonal_anomaly_frame(orders: DataFrame) -> DataFrame:
    """Frame core of timeseries_seasonal_anomaly (scaling-probe
    entry)."""
    daily = (
        orders.select(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    det = (
        daily.select(
            "day",
            "rev",
            F.sum("rev").over(w).cast("bigint").alias("w_sum"),
            F.count("*").over(w).cast("bigint").alias("w_n"),
        )
        .filter(F.col("w_n") == 7)
        .select(
            "day",
            "rev",
            F.dayofweek("day").cast("int").alias("dow"),
            F.expr("w_sum div 7").alias("trend"),
            (F.col("rev") - F.expr("w_sum div 7")).alias("detrended"),
        )
    )
    seas = det.groupBy("dow").agg(
        F.expr("CAST(sum(detrended) div count(*) AS BIGINT)").alias("seasonal")
    )
    resid = det.join(seas, "dow").select(
        (F.col("detrended") - F.col("seasonal")).alias("r")
    )

    def lower_median(vals: DataFrame, col: str, n_frame: DataFrame) -> DataFrame:
        c = vals.groupBy(F.col(col).alias("v")).agg(
            F.count("*").cast("bigint").alias("c")
        )
        cdf = c.select(
            "v", F.sum("c").over(W.orderBy("v")).cast("bigint").alias("hi")
        )
        return (
            cdf.crossJoin(F.broadcast(n_frame))  # 1-row count
            .filter(F.expr("hi >= (n + 1) div 2"))
            .agg(F.min("v").cast("bigint").alias("m"))
        )

    rt = resid.agg(F.count("*").cast("bigint").alias("n"))
    med = lower_median(resid, "r", rt)
    dev = resid.crossJoin(F.broadcast(med)).select(  # 1-row median
        F.abs(F.col("r") - F.col("m")).alias("d"), "r"
    )
    mad = lower_median(dev.select("d"), "d", rt).withColumnRenamed("m", "mad")
    return (
        dev.crossJoin(F.broadcast(mad))  # 1-row MAD
        .crossJoin(F.broadcast(rt))  # 1-row count
        .crossJoin(F.broadcast(med.withColumnRenamed("m", "med2")))
        .agg(
            F.first("n").alias("n_days"),
            F.first("med2").alias("resid_median_cents"),
            F.first("mad").alias("resid_mad_cents"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
            F.max(
                F.when(F.col("d") > 3 * F.col("mad"), F.col("d"))
            )
            .cast("bigint")
            .alias("worst_abs_dev_cents"),
        )
    )


# ---------------------------------------------------------------------------
# set_except_all_returns / set_intersect_all_returns — BAG semantics:
# multiplicity matters. The multiset of (custkey) occurrences from
# R-flagged lineitem orders EXCEPT ALL the A-flagged ones keeps the
# SURPLUS occurrences (a customer with 3 R-orders and 1 A-order
# survives twice); INTERSECT ALL keeps the min multiplicity. The
# registered DISTINCT-semantics set ops can't express either.
# Output is collapsed to (custkey, n_occurrences) so the differential
# is order-free.
# ---------------------------------------------------------------------------


@query(
    "set_except_all_returns",
    oracle="""
    WITH surplus AS (
      SELECT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'A'
    )
    SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_surplus
    FROM surplus GROUP BY o_custkey ORDER BY custkey
    """,
)
def set_except_all_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per-customer surplus of R-flagged
    over A-flagged line occurrences."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def side(flag: str) -> DataFrame:
        return (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .filter(F.col("l_returnflag") == flag)
            .select("o_custkey")
        )

    return (
        side("R")
        .exceptAll(side("A"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").cast("bigint").alias("n_surplus"))
        .orderBy("custkey")
    )


@query(
    "set_intersect_all_returns",
    oracle="""
    WITH common AS (
      SELECT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'A'
    )
    SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_common
    FROM common GROUP BY o_custkey ORDER BY custkey
    """,
)
def set_intersect_all_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): per-customer min multiplicity of
    R-flagged vs A-flagged line occurrences."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def side(flag: str) -> DataFrame:
        return (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .filter(F.col("l_returnflag") == flag)
            .select("o_custkey")
        )

    return (
        side("R")
        .intersectAll(side("A"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# part_share_of_parent — brand revenue inside its part type: the
# drill report rollup rows don't give you (a rollup emits the levels;
# this emits each level's SHARE of its parent — integer ppm, with the
# type's share of total alongside).
# ---------------------------------------------------------------------------


@query(
    "part_share_of_parent",
    oracle="""
    WITH rev AS (
      SELECT p.p_type, p.p_brand,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, p.p_brand
    ),
    m AS (
      SELECT p_type, CAST(sum(cents) AS BIGINT) AS type_cents
      FROM rev GROUP BY p_type
    ),
    t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM rev)
    SELECT rev.p_type, rev.p_brand, rev.cents AS brand_cents,
           m.type_cents,
           CAST((1000000 * rev.cents) // m.type_cents AS BIGINT)
             AS share_of_type_ppm,
           CAST((1000000 * m.type_cents) // t.total_cents AS BIGINT)
             AS type_share_ppm
    FROM rev JOIN m USING (p_type) CROSS JOIN t
    ORDER BY rev.p_type, rev.p_brand
    """,
)
def part_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-within-type revenue drill: brand cents, parent cents,
    share-of-parent ppm, parent share-of-total ppm."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    m = rev.groupBy("p_type").agg(
        F.sum("cents").cast("bigint").alias("type_cents")
    )
    t = rev.agg(F.sum("cents").cast("bigint").alias("total_cents"))
    return (
        rev.join(m, "p_type")
        .crossJoin(F.broadcast(t))  # 1-row grand total
        .select(
            "p_type",
            "p_brand",
            F.col("cents").alias("brand_cents"),
            "type_cents",
            F.expr(
                "CAST((1000000 * cents) div type_cents AS BIGINT)"
            ).alias("share_of_type_ppm"),
            F.expr(
                "CAST((1000000 * type_cents) div total_cents AS BIGINT)"
            ).alias("type_share_ppm"),
        )
        .orderBy("p_type", "p_brand")
    )
