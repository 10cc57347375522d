"""Round-6 wave-25 workloads: business scorecards and retention
economics — cohort net revenue retention (the SaaS metric: of the
revenue a signup cohort produced in its first year, how much did the
SAME customers produce in the next — expansion net of churn, exact
cents), the supplier scorecard (one weighted composite of return
rate, revenue share, and customer reach in ppm — the ranked
operational readout a procurement team acts on), and DAU/MAU
stickiness (the engagement ratio beside events_rolling_wau: daily
actives over the trailing 28-day actives, exact distinct counts over
the day support).

Determinism rules (house style): all money exact cents; all ratios
integer ppm by one floor division; composite weights pinned literals
summing to 1e6 so the score is an exact integer; stickiness uses
exact COUNT(DISTINCT) per window (the support is user x day — the
combinable pre-aggregate keeps windows off raw events).

Scale notes: NRR is two customer-keyed conditional aggregates off one
scan; the scorecard is one lineitem aggregate keyed by supplier
joined to two dim-sized totals; stickiness pre-collapses to distinct
(user, day) then windows over the day support with a distinct-count
per frame — the one heavy window in the wave, range-partitionable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# orders_nrr_cohorts — per signup-year cohort (first-order year):
# base-period revenue (cohort year) vs the SAME customers' revenue the
# following year, NRR in ppm. Expansion > 1e6, churn < 1e6.
# ---------------------------------------------------------------------------


@query(
    "orders_nrr_cohorts",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(min(year(o_orderdate)) AS BIGINT) AS cohort_year
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      SELECT c.cohort_year,
             CAST(sum(CASE WHEN year(o.o_orderdate) = c.cohort_year
                           THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS base_cents,
             CAST(sum(CASE WHEN year(o.o_orderdate) = c.cohort_year + 1
                           THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS next_cents,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
      FROM orders o JOIN cust c ON o.o_custkey = c.o_custkey
      GROUP BY c.cohort_year
    )
    SELECT cohort_year, n_customers, base_cents, next_cents,
           CAST((1000000 * next_cents) // base_cents AS BIGINT) AS nrr_ppm
    FROM rev ORDER BY cohort_year
    """,
)
def orders_nrr_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort net revenue retention: first-order-year cohorts, base vs
    following-year revenue from the same customers, NRR in ppm."""
    return nrr_frame(table(spark, sf_dir, "orders"))


def nrr_frame(orders: DataFrame) -> DataFrame:
    """Frame core of orders_nrr_cohorts (scaling-probe entry)."""
    cust = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).cast("bigint").alias("cohort_year")
    )
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    return (
        orders.join(cust, "o_custkey")
        .groupBy("cohort_year")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN year(o_orderdate) = cohort_year"
                    f" THEN {cents} ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("base_cents"),
            F.sum(
                F.expr(
                    f"CASE WHEN year(o_orderdate) = cohort_year + 1"
                    f" THEN {cents} ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("next_cents"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        )
        .select(
            "cohort_year",
            "n_customers",
            "base_cents",
            "next_cents",
            F.expr(
                "CAST((1000000 * next_cents) div base_cents AS BIGINT)"
            ).alias("nrr_ppm"),
        )
        .orderBy("cohort_year")
    )


# ---------------------------------------------------------------------------
# supplier_scorecard — one composite per supplier: low return rate is
# good (weight 40%), revenue share is good (40%), distinct-order reach
# is good (20%). Each component normalized to ppm of the best
# performer, composite = exact weighted integer sum. Top-25 by
# composite with full tiebreak.
# ---------------------------------------------------------------------------


@query(
    "supplier_scorecard",
    oracle="""
    WITH s AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem GROUP BY l_suppkey
    ),
    best AS (
      SELECT CAST(max(rev_cents) AS BIGINT) AS max_rev,
             CAST(max(n_orders) AS BIGINT) AS max_orders
      FROM s
    ),
    scored AS (
      SELECT s.l_suppkey, s.rev_cents, s.n_lines, s.n_returned, s.n_orders,
             CAST((1000000 * s.n_returned) // s.n_lines AS BIGINT)
               AS return_ppm,
             CAST(
               400000 * (1000000 - (1000000 * s.n_returned) // s.n_lines)
                 // 1000000
               + 400000 * ((1000000 * s.rev_cents) // best.max_rev) // 1000000
               + 200000 * ((1000000 * s.n_orders) // best.max_orders)
                 // 1000000
               AS BIGINT) AS composite_ppm
      FROM s CROSS JOIN best
    )
    SELECT l_suppkey, rev_cents, return_ppm, n_orders, composite_ppm
    FROM scored
    ORDER BY composite_ppm DESC, l_suppkey LIMIT 25
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 supplier composite scorecard: 40% low-return, 40%
    revenue share of best, 20% order reach — exact integer ppm."""
    return scorecard_frame(table(spark, sf_dir, "lineitem"))


def scorecard_frame(li: DataFrame) -> DataFrame:
    """Frame core of supplier_scorecard (scaling-probe entry)."""
    s = li.groupBy("l_suppkey").agg(
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("rev_cents"),
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
    )
    best = s.agg(
        F.max("rev_cents").cast("bigint").alias("max_rev"),
        F.max("n_orders").cast("bigint").alias("max_orders"),
    )
    return (
        s.crossJoin(F.broadcast(best))  # 1-row best performer
        .select(
            "l_suppkey",
            "rev_cents",
            F.expr("CAST((1000000 * n_returned) div n_lines AS BIGINT)").alias(
                "return_ppm"
            ),
            "n_orders",
            F.expr(
                "CAST("
                "400000 * (1000000 - (1000000 * n_returned) div n_lines)"
                " div 1000000"
                " + 400000 * ((1000000 * rev_cents) div max_rev) div 1000000"
                " + 200000 * ((1000000 * n_orders) div max_orders)"
                " div 1000000"
                " AS BIGINT)"
            ).alias("composite_ppm"),
        )
        .orderBy(F.desc("composite_ppm"), F.asc("l_suppkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# events_stickiness — DAU / trailing-28-day-MAU per day (the
# engagement ratio): exact distinct users per day and per trailing
# window, computed over the pre-collapsed (user, day) support. Only
# interior days (a full 28-day trailing window) are emitted so the
# ratio is never inflated by a short window.
# ---------------------------------------------------------------------------


@query(
    "events_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    mau AS (
      SELECT d.day,
             CAST(count(DISTINCT ud.user_id) AS BIGINT) AS mau
      FROM days d JOIN ud
        ON ud.day > d.day - INTERVAL 28 DAY AND ud.day <= d.day
      GROUP BY d.day
    ),
    lo AS (SELECT min(day) AS d0 FROM ud)
    SELECT dau.day, dau.dau, mau.mau,
           CAST((1000000 * dau.dau) // mau.mau AS BIGINT)
             AS stickiness_ppm
    FROM dau JOIN mau USING (day)
    WHERE dau.day >= (SELECT d0 FROM lo) + INTERVAL 27 DAY
    ORDER BY dau.day
    """,
)
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU over trailing-28-day MAU per day (interior days only),
    exact distinct counts, ratio in ppm."""
    return stickiness_frame(table(spark, sf_dir, "events"))


def stickiness_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_stickiness (scaling-probe entry)."""
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    mau = (
        days.alias("d")
        .join(
            ud.alias("u"),
            (F.col("u.day") > F.expr("d.day - INTERVAL 28 DAY"))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").cast("bigint").alias("mau"))
    )
    lo = ud.agg(F.min("day").alias("d0"))
    return (
        dau.join(mau, "day")
        .crossJoin(F.broadcast(lo))  # 1-row first day
        .filter(F.expr("day >= d0 + INTERVAL 27 DAY"))
        .select(
            "day",
            "dau",
            "mau",
            F.expr("CAST((1000000 * dau) div mau AS BIGINT)").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day")
    )
