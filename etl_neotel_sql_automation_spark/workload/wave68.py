"""Round-8 wave-68 workload: orders_littles_law — the queueing
readout: treat each order line as a job that arrives at o_orderdate
and departs at l_shipdate, and check Little's law L = lambda * W
month by month: average work-in-progress (open lines per day) vs
arrival rate times mean fulfillment latency. The operations family
measures each piece separately (interarrival quartiles, concurrency,
funnel latency); Little's law is the CONSISTENCY identity between
them — the ratio L/(lambda*W) reads 1 under stationarity and drifts
exactly where arrivals surge or latency shifts mid-month (edge
effects), which is the capacity-planning diagnostic.

Semantics: a line is in flight on day d iff orderdate <= d <
shipdate (duration = ship - order days; same-day ships contribute
zero WIP). Monthly overlap days are the exact integer
max(0, min(ship-1, month_end) - max(order, month_start) + 1); L_m =
overlap-day sum / days-in-month; lambda_m = lines ORDERED in month /
days; W_m = mean duration of lines ordered in month. All sums exact
BIGINTs; L, lambda, W and the ratio are fixed double closed forms,
round(6).

Scale shape: one orders-lineitem equi-join (the standard star
shuffle), then a theta-join of the line intervals against the
MONTH GRID — bounded by the date domain (~84 rows from a 1-row
min/max aggregate, the calendar-explode pattern), never by data —
into month-keyed combinable aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table


def littles_frame(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Frame core of orders_littles_law (scaling-probe entry)."""
    li = lineitem.select(
        "l_orderkey",
        F.expr("datediff(l_shipdate, DATE '1970-01-01')").alias("ship"),
    ).join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.expr("datediff(o_orderdate, DATE '1970-01-01')").alias("ord"),
        ),
        "l_orderkey",
    ).select("ord", "ship")
    rng = li.agg(
        F.min("ord").cast("int").alias("lo"), F.max("ship").cast("int").alias("hi")
    )
    months = rng.select(
        F.explode(
            F.expr(
                "sequence(date_trunc('MONTH', date_add(DATE '1970-01-01', lo)),"
                " date_trunc('MONTH', date_add(DATE '1970-01-01', hi)),"
                " interval 1 month)"
            )
        ).alias("m0")
    ).select(
        F.col("m0").cast("date").alias("month_start"),
        F.expr(
            "datediff(last_day(CAST(m0 AS DATE)), DATE '1970-01-01')"
        ).cast("int").alias("me"),
        F.expr("datediff(CAST(m0 AS DATE), DATE '1970-01-01')")
        .cast("int")
        .alias("ms"),
    )
    j = li.join(
        F.broadcast(months),
        (F.col("ship") - 1 >= F.col("ms")) & (F.col("ord") <= F.col("me")),
    )
    wip = j.groupBy("month_start", "ms", "me").agg(
        F.sum(
            F.expr(
                "greatest(0, least(ship - 1, me) - greatest(ord, ms) + 1)"
            )
        ).cast("bigint").alias("open_line_days")
    )
    arr = li.join(
        F.broadcast(months),
        (F.col("ord") >= F.col("ms")) & (F.col("ord") <= F.col("me")),
    ).groupBy("month_start", "ms", "me").agg(
        F.count("*").cast("bigint").alias("n_arrived"),
        F.sum(F.expr("ship - ord")).cast("bigint").alias("dur_days"),
    )
    out = wip.join(arr, ["month_start", "ms", "me"], "full_outer").select(
        "month_start",
        F.expr("CAST(me - ms + 1 AS BIGINT)").alias("days_in_month"),
        F.coalesce("n_arrived", F.lit(0)).cast("bigint").alias("n_arrived"),
        F.coalesce("open_line_days", F.lit(0))
        .cast("bigint")
        .alias("open_line_days"),
        F.coalesce("dur_days", F.lit(0)).cast("bigint").alias("dur_days"),
    )
    return out.select(
        "month_start",
        "days_in_month",
        "n_arrived",
        "open_line_days",
        F.expr(
            "CASE WHEN n_arrived > 0"
            " THEN round(dur_days * 1.0e0 / n_arrived, 6) END"
        ).alias("mean_latency_days"),
        F.expr(
            "round(open_line_days * 1.0e0 / days_in_month, 6)"
        ).alias("avg_wip"),
        F.expr(
            "CASE WHEN dur_days > 0"
            " THEN round(open_line_days * 1.0e0 / dur_days, 6) END"
        ).alias("littles_ratio"),
    ).orderBy("month_start")


@query(
    "orders_littles_law",
    oracle="""
    WITH li AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS ord,
             date_diff('day', DATE '1970-01-01', l_shipdate) AS ship
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    rng AS (SELECT CAST(min(ord) AS INTEGER) AS lo,
                   CAST(max(ship) AS INTEGER) AS hi FROM li),
    months AS (
      SELECT CAST(m0 AS DATE) AS month_start,
             CAST(date_diff('day', DATE '1970-01-01', CAST(m0 AS DATE))
                  AS INTEGER) AS ms,
             CAST(date_diff('day', DATE '1970-01-01',
                  last_day(CAST(m0 AS DATE))) AS INTEGER) AS me
      FROM (
        SELECT unnest(generate_series(
          date_trunc('month', DATE '1970-01-01' + INTERVAL (lo) DAY),
          date_trunc('month', DATE '1970-01-01' + INTERVAL (hi) DAY),
          INTERVAL 1 MONTH)) AS m0
        FROM rng
      )
    ),
    wip AS (
      SELECT month_start, ms, me,
             CAST(sum(greatest(0, least(ship - 1, me)
                  - greatest(ord, ms) + 1)) AS BIGINT) AS open_line_days
      FROM li JOIN months ON ship - 1 >= ms AND ord <= me
      GROUP BY 1, 2, 3
    ),
    arr AS (
      SELECT month_start, ms, me,
             CAST(count(*) AS BIGINT) AS n_arrived,
             CAST(sum(ship - ord) AS BIGINT) AS dur_days
      FROM li JOIN months ON ord >= ms AND ord <= me
      GROUP BY 1, 2, 3
    ),
    out AS (
      SELECT coalesce(wip.month_start, arr.month_start) AS month_start,
             coalesce(wip.ms, arr.ms) AS ms, coalesce(wip.me, arr.me) AS me,
             CAST(coalesce(n_arrived, 0) AS BIGINT) AS n_arrived,
             CAST(coalesce(open_line_days, 0) AS BIGINT) AS open_line_days,
             CAST(coalesce(dur_days, 0) AS BIGINT) AS dur_days
      FROM wip FULL OUTER JOIN arr
        ON wip.month_start = arr.month_start
    )
    SELECT month_start,
           CAST(me - ms + 1 AS BIGINT) AS days_in_month,
           n_arrived, open_line_days,
           CASE WHEN n_arrived > 0
                THEN round(dur_days * 1.0e0 / n_arrived, 6) END
             AS mean_latency_days,
           round(open_line_days * 1.0e0 / (me - ms + 1), 6) AS avg_wip,
           CASE WHEN dur_days > 0
                THEN round(open_line_days * 1.0e0 / dur_days, 6) END
             AS littles_ratio
    FROM out ORDER BY month_start
    """,
)
def orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly Little's-law profile over order lines (arrive at order
    date, depart at ship date): arrivals, exact open-line-days, mean
    latency, average WIP, and the L/(lambda*W) stationarity ratio."""
    return littles_frame(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )
