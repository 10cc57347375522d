"""Round-6 wave-21 workloads: operational detection — the duplicate-
payment detector (same customer, same cents, within 3 days: the
double-charge audit every billing system runs), a p-chart on weekly
return share (SPC control limits for PROPORTIONS — CUSUM/EWMA watch a
mean, the p-chart watches a rate with size-aware limits), and funnel
conversion-latency quartiles (events_funnel reports the mean;
the median/quartiles are the product numbers when latency is
heavy-tailed — the agg_percentile_cont convention over the
minute-quantized latency support).

Determinism rules (house style): shares in integer ppm; control
limits as round(…, 6) doubles off exact integer counts; latency
quantized to whole minutes per user BEFORE the CDF so the quartile
window runs over the bounded minute support; interpolated quartiles
follow the percentile_cont convention exactly (integer micro-minute
arithmetic on the two bracketing support values).

Scale notes: the duplicate scan joins on (custkey, cents) — an
equi-key self-join whose fan-out is bounded by per-key multiplicity,
never a cross join; the p-chart is one weekly combinable aggregate;
the latency CDF is two user-sized aggregates into a minute-support
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# dq_duplicate_payments — rapid-repeat-charge audit: DISTINCT order
# pairs by the same customer within 7 days, emitted once
# (okey_a < okey_b), summarized per day gap with the strict
# double-charge signals as columns: pairs whose cent amounts match
# exactly, and pairs within $1. The per-gap summary keeps the output
# bounded (pair lists explode at scale; the audit readout is "how
# many, how tight, how suspicious").
#
# Scale shape: the self-join is customer-keyed — fan-out bounded by
# per-customer order multiplicity, never a cross join.
# ---------------------------------------------------------------------------


@query(
    "dq_duplicate_payments",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS d
      FROM orders
    ),
    pairs AS (
      SELECT a.o_custkey,
             CAST(abs(date_diff('day', a.d, b.d)) AS BIGINT) AS gap_days,
             CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END AS exact_cents,
             CASE WHEN abs(a.cents - b.cents) <= 100 THEN 1 ELSE 0 END
               AS within_dollar
      FROM o a JOIN o b
        ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      WHERE abs(date_diff('day', a.d, b.d)) <= 7
    )
    SELECT gap_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(exact_cents) AS BIGINT) AS n_exact_cents,
           CAST(sum(within_dollar) AS BIGINT) AS n_within_dollar
    FROM pairs GROUP BY gap_days ORDER BY gap_days
    """,
)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid-repeat-charge audit: same-customer order pairs within 7
    days per day gap, with exact-cent and within-a-dollar match
    counts as the double-charge signals."""
    return duplicate_payments_frame(table(spark, sf_dir, "orders"))


def duplicate_payments_frame(orders: DataFrame) -> DataFrame:
    """Frame core of dq_duplicate_payments (scaling-probe entry)."""
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d"),
    )
    a = o.alias("a")
    b = o.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= 7)
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.abs(F.datediff(F.col("a.d"), F.col("b.d")))
            .cast("bigint")
            .alias("gap_days"),
            F.when(F.col("a.cents") == F.col("b.cents"), 1)
            .otherwise(0)
            .alias("exact_cents"),
            F.when(F.abs(F.col("a.cents") - F.col("b.cents")) <= 100, 1)
            .otherwise(0)
            .alias("within_dollar"),
        )
    )
    return (
        pairs.groupBy("gap_days")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum("exact_cents").cast("bigint").alias("n_exact_cents"),
            F.sum("within_dollar").cast("bigint").alias("n_within_dollar"),
        )
        .orderBy("gap_days")
    )


# ---------------------------------------------------------------------------
# quality_pchart_returns — statistical process control on the weekly
# return RATE (share of lineitems with l_returnflag = 'R'): pooled
# p-bar, per-week n and rate, 3-sigma limits UCL/LCL sized by each
# week's own n (sqrt(p(1-p)/n) — the defining feature of a p-chart vs
# a fixed band), and the out-of-control flag. Counts exact; limits
# are round(…, 6) closed forms off the exact integers.
# ---------------------------------------------------------------------------


# shared verbatim with the streaming twin (wave23) so batch and stream
# stay in oracle lock-step
PCHART_ORACLE = """
    WITH w AS (
      SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM lineitem GROUP BY 1
    ),
    pool AS (
      SELECT CAST(sum(r) AS BIGINT) AS rt, CAST(sum(n) AS BIGINT) AS nt
      FROM w
    )
    SELECT w.week, w.n, w.r,
           CAST((1000000 * w.r) // w.n AS BIGINT) AS rate_ppm,
           CAST((1000000 * pool.rt) // pool.nt AS BIGINT) AS pbar_ppm,
           round(pool.rt * 1.0e0 / pool.nt
                 + 3.0e0 * sqrt((pool.rt * 1.0e0 / pool.nt)
                                * (1.0e0 - pool.rt * 1.0e0 / pool.nt)
                                / w.n), 6) AS ucl,
           round(greatest(pool.rt * 1.0e0 / pool.nt
                 - 3.0e0 * sqrt((pool.rt * 1.0e0 / pool.nt)
                                * (1.0e0 - pool.rt * 1.0e0 / pool.nt)
                                / w.n), 0.0e0), 6) AS lcl,
           CASE WHEN w.r * 1.0e0 / w.n
                     > pool.rt * 1.0e0 / pool.nt
                       + 3.0e0 * sqrt((pool.rt * 1.0e0 / pool.nt)
                                      * (1.0e0 - pool.rt * 1.0e0 / pool.nt)
                                      / w.n)
                  OR w.r * 1.0e0 / w.n
                     < pool.rt * 1.0e0 / pool.nt
                       - 3.0e0 * sqrt((pool.rt * 1.0e0 / pool.nt)
                                      * (1.0e0 - pool.rt * 1.0e0 / pool.nt)
                                      / w.n)
                THEN 1 ELSE 0 END AS out_of_control
    FROM w CROSS JOIN pool ORDER BY w.week
    """


@query("quality_pchart_returns", oracle=PCHART_ORACLE)
def quality_pchart_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart on weekly lineitem return share: per-week rate, pooled
    p-bar, size-aware 3-sigma UCL/LCL, out-of-control flag."""
    return pchart_frame(table(spark, sf_dir, "lineitem"))


def pchart_frame(li: DataFrame) -> DataFrame:
    """Frame core of quality_pchart_returns (scaling-probe entry)."""
    w = (
        li.select(
            F.date_trunc("week", F.col("l_shipdate")).cast("date").alias("week"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_r"),
        )
        .groupBy("week")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("is_r").cast("bigint").alias("r"),
        )
    )
    pool = w.agg(
        F.sum("r").cast("bigint").alias("rt"),
        F.sum("n").cast("bigint").alias("nt"),
    )
    pbar = "(rt * 1.0e0 / nt)"
    sig = f"sqrt({pbar} * (1.0e0 - {pbar}) / n)"
    return (
        w.crossJoin(F.broadcast(pool))  # 1-row pooled rate
        .select(
            "week",
            "n",
            "r",
            F.expr("CAST((1000000 * r) div n AS BIGINT)").alias("rate_ppm"),
            F.expr("CAST((1000000 * rt) div nt AS BIGINT)").alias("pbar_ppm"),
            F.expr(f"round({pbar} + 3.0e0 * {sig}, 6)").alias("ucl"),
            F.expr(
                f"round(greatest({pbar} - 3.0e0 * {sig}, 0.0e0), 6)"
            ).alias("lcl"),
            F.expr(
                f"CASE WHEN r * 1.0e0 / n > {pbar} + 3.0e0 * {sig}"
                f" OR r * 1.0e0 / n < {pbar} - 3.0e0 * {sig}"
                " THEN 1 ELSE 0 END"
            ).alias("out_of_control"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# events_funnel_latency — quartiles of the signup -> first-purchase
# conversion latency (events_funnel reports the mean; the median is
# the product number when latency is heavy-tailed). Latency quantizes
# to whole MINUTES per user first, so the interpolated-quartile window
# runs over the bounded minute support (the
# orders_interarrival_quartiles machinery, percentile_cont
# convention: exact micro-minute interpolation between the two
# bracketing support values).
# ---------------------------------------------------------------------------


def _latency_quartile_sql(q_num: int, q_den: int, alias: str) -> str:
    """percentile_cont((q_num/q_den)) over the minute support in exact
    micro-minutes: h = (n-1)*q_num/q_den; floor(h) and ceil(h) rows
    looked up in the support CDF; linear interpolation in integer
    micro-minutes."""
    return f"""
      (SELECT CAST(
         (SELECT v FROM cdf WHERE rn_hi >= ((t.n - 1) * {q_num}) // {q_den} + 1
          ORDER BY v LIMIT 1) * 1000000
         + CASE WHEN ((t.n - 1) * {q_num}) % {q_den} = 0 THEN 0
           ELSE (((t.n - 1) * {q_num}) % {q_den}) * 1000000 // {q_den}
                * ((SELECT v FROM cdf
                    WHERE rn_hi >= ((t.n - 1) * {q_num}) // {q_den} + 2
                    ORDER BY v LIMIT 1)
                   - (SELECT v FROM cdf
                      WHERE rn_hi >= ((t.n - 1) * {q_num}) // {q_den} + 1
                      ORDER BY v LIMIT 1))
           END AS BIGINT)
       FROM t) AS {alias}"""


@query(
    "events_funnel_latency",
    oracle=f"""
    WITH signup AS (
      SELECT user_id, min(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      -- floored epoch seconds, NOT date_diff('minute'): date_diff
      -- counts minute-boundary crossings while Spark's
      -- unix_timestamp div 60 floors elapsed time
      SELECT e.user_id,
             CAST((CAST(floor(epoch(min(e.ts))) AS BIGINT)
                   - CAST(floor(epoch(s.first_signup)) AS BIGINT)) // 60
                  AS BIGINT) AS lat_min
      FROM events e JOIN signup s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.first_signup
      GROUP BY e.user_id, s.first_signup
    ),
    sup AS (
      SELECT lat_min AS v, CAST(count(*) AS BIGINT) AS c
      FROM conv GROUP BY lat_min
    ),
    cdf AS (
      SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS rn_hi FROM sup
    ),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sup)
    SELECT t.n AS n_converted,
           {_latency_quartile_sql(1, 4, "p25_micromin")},
           {_latency_quartile_sql(2, 4, "p50_micromin")},
           {_latency_quartile_sql(3, 4, "p75_micromin")}
    FROM t
    """,
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> first-purchase latency quartiles (interpolated,
    percentile_cont convention) in exact micro-minutes over the
    minute-quantized latency support."""
    return funnel_latency_frame(table(spark, sf_dir, "events"))


def funnel_latency_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_funnel_latency (scaling-probe entry)."""
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") > F.col("first_signup"))
        .groupBy("user_id", "first_signup")
        .agg(F.min("ts").alias("first_purchase"))
        .select(
            F.expr(
                "CAST((unix_timestamp(first_purchase)"
                " - unix_timestamp(first_signup)) div 60 AS BIGINT)"
            ).alias("lat_min")
        )
    )
    sup = conv.groupBy(F.col("lat_min").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    cdf = sup.select(
        "v", F.sum("c").over(W.orderBy("v")).cast("bigint").alias("rn_hi")
    )
    t = sup.agg(F.sum("c").cast("bigint").alias("n"))

    def quartile(qn: int, qd: int, alias: str):
        # value at CDF rank r: the smallest support v with rn_hi >= r
        lo_rank = f"((n - 1) * {qn}) div {qd} + 1"
        frac = f"((n - 1) * {qn}) % {qd}"
        lo = (
            f"(SELECT min(v) FROM {{cdf}} WHERE rn_hi >= {lo_rank})"
        )
        hi = (
            f"(SELECT min(v) FROM {{cdf}} WHERE rn_hi >= {lo_rank} + 1)"
        )
        return lo, hi, frac, alias

    # Spark side: realize the two bracketing support values per
    # quartile with conditional aggregates over the (tiny) cdf frame
    cdf_t = cdf.crossJoin(F.broadcast(t))  # 1-row count onto support rows
    qcols = []
    for qn, alias in ((1, "p25_micromin"), (2, "p50_micromin"),
                      (3, "p75_micromin")):
        lo_rank = f"((n - 1) * {qn}) div 4 + 1"
        frac = f"((n - 1) * {qn}) % 4"
        qcols.append(
            F.expr(
                f"CAST(min(CASE WHEN rn_hi >= {lo_rank} THEN v END) * 1000000"
                f" + CASE WHEN {frac} = 0 THEN 0"
                f"   ELSE ({frac}) * 1000000 div 4"
                f"     * (min(CASE WHEN rn_hi >= {lo_rank} + 1 THEN v END)"
                f"        - min(CASE WHEN rn_hi >= {lo_rank} THEN v END))"
                f"   END AS BIGINT)"
            ).alias(alias)
        )
    return cdf_t.groupBy("n").agg(*qcols).select(
        F.col("n").alias("n_converted"),
        "p25_micromin",
        "p50_micromin",
        "p75_micromin",
    )
