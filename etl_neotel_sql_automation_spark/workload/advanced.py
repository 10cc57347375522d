"""Advanced operator workloads: as-of join, sessionization, exact
percentiles, pivot/unpivot, grouping sets, salted skew join, union-all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.asof import asof_join, session_stats
from ..ops.skew import salted_join
from . import query, table


@query(
    "asof_events_orders",
    oracle="""
    WITH j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id,
           o_orderkey AS last_orderkey,
           CAST(o_orderdate AS DATE) AS last_orderdate
    FROM j WHERE rn = 1
    """,
)
def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event gets its user's most recent order
    at event time. Engine impl is the union-merge window (one shuffle,
    no join amplification); the oracle is the equivalent (but
    amplifying) join+row_number SQL — DuckDB's native ASOF JOIN has
    nondeterministic tie-breaks, so the explicit form is used."""
    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        orders.select("o_custkey", "o_orderdate", "o_orderkey"),
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_vals=["o_orderkey", "o_orderdate"],
    )
    return out.filter(F.col("o_orderkey").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").cast("date").alias("last_orderdate"),
    )


@query(
    "asof_forward_events",
    oracle="""
    WITH s AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'signup'),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    j AS (
      SELECT s.event_id, s.user_id,
             p.event_id AS p_eid, p.ts AS p_ts,
             row_number() OVER (PARTITION BY s.event_id
                                ORDER BY p.ts ASC, p.event_id DESC) AS rn
      FROM s JOIN p ON p.user_id = s.user_id AND p.ts >= s.ts
    )
    SELECT event_id, user_id,
           p_eid AS next_purchase_id, p_ts AS next_purchase_ts
    FROM j WHERE rn = 1
    """,
)
def asof_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — the attribution shape ("which purchase
    followed this touchpoint"): each signup event attaches the same
    user's NEXT purchase event at-or-after signup time. Pairs with the
    backward variant's state-at-time shape; same single-shuffle
    union-merge plan, iterated in descending time order. Ties on
    purchase time resolve to the greatest (event_id, ts) tuple,
    mirrored by the oracle's ORDER BY."""
    ev = table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_eid"),
        F.col("ts").alias("p_ts"),
    )
    out = asof_join(
        signups,
        purchases,
        left_key="user_id",
        right_key="p_user",
        left_time="ts",
        right_time="p_ts",
        right_vals=["p_eid", "p_ts"],
        direction="forward",
    )
    return out.filter(F.col("p_eid").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("p_eid").alias("next_purchase_id"),
        F.col("p_ts").alias("next_purchase_ts"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
      FROM g
    )
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization (lag-gap + running sum windows)."""
    return session_stats(table(spark, sf_dir, "events"), gap_minutes=30.0)


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``; ``approx_percentile`` is the at-scale variant but
    is not oracle-comparable)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


@query(
    "pivot_flag_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2) AS qty_O,
           round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "unpivot_flag_status",
    oracle="""
    WITH p AS (
      SELECT l_returnflag,
             round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2) AS qty_O,
             round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2) AS qty_F
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_O' AS status, qty_O AS qty FROM p
    UNION ALL
    SELECT l_returnflag, 'qty_F' AS status, qty_F AS qty FROM p
    """,
)
def unpivot_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: pivot then unpivot back to long form (melt)."""
    wide = pivot_flag_status(spark, sf_dir)
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_O", "qty_F"],
        variableColumnName="status",
        valueColumnName="qty",
    )


@query(
    "groupingsets_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def groupingsets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (same Catalyst plan space as the
    DataFrame API; registered as a temp view)."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "set_union_all_priorities",
    oracle="""
    SELECT o_orderpriority, count(*) AS n FROM (
      SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000
      UNION ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    ) GROUP BY o_orderpriority
    """,
)
def set_union_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 300000).select("o_orderpriority")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return a.unionByName(b).groupBy("o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "join_salted_skew",
    oracle="""
    SELECT s_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join equals the plain join — the oracle IS the plain SQL
    join, so the differential check proves salting is semantics-free."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    joined = salted_join(li, supp, key="l_suppkey", n_salt=8)
    return joined.groupBy("s_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )
