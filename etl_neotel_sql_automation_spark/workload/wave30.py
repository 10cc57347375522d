"""Round-6 wave-30 workload: winsorization as a TRANSFORM with its
own audit — clamp order values at the exact interpolated p01/p99 of
the corpus (computed off the support-collapsed cent CDF, the
percentile_cont convention), and report per priority segment what the
clamp did: rows clamped at each tail, mean before/after in exact floor
cents. agg_trimmed_mean (registered) DROPS the tails; this is the
production alternative that keeps the rows — and unlike a meter, the
output row set proves the transform's arithmetic, not just its
existence.

Determinism: the two clip bounds are exact integer micro-cents from
the support CDF (both engines floor identically); clamping compares
cents against ceil'd bounds so the boundary row lands identically;
means are floor cents.

Scale: one support-collapsed CDF (bounded by distinct cent values),
two rank probes, one segment-keyed conditional aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table


def _pct_sql(q_num: int, q_den: int, alias: str) -> str:
    """Exact interpolated percentile over the cent-support CDF, in
    micro-cents (the events_funnel_latency machinery)."""
    lo = f"((t.n - 1) * {q_num}) // {q_den} + 1"
    frac = f"((t.n - 1) * {q_num}) % {q_den}"
    return f"""
      (SELECT CAST(
         (SELECT v FROM cdf WHERE rn_hi >= {lo} ORDER BY v LIMIT 1) * 1000000
         + CASE WHEN {frac} = 0 THEN 0
           ELSE ({frac}) * 1000000 // {q_den}
                * ((SELECT v FROM cdf WHERE rn_hi >= {lo} + 1
                    ORDER BY v LIMIT 1)
                   - (SELECT v FROM cdf WHERE rn_hi >= {lo}
                      ORDER BY v LIMIT 1))
           END AS BIGINT)
       FROM t) AS {alias}"""


@query(
    "quality_winsorize_orders",
    oracle=f"""
    WITH q AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    sup AS (SELECT cents AS v, CAST(count(*) AS BIGINT) AS c
            FROM q GROUP BY cents),
    cdf AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS rn_hi
            FROM sup),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sup),
    bounds AS (
      SELECT {_pct_sql(1, 100, "lo_micro")}, {_pct_sql(99, 100, "hi_micro")}
    ),
    clamped AS (
      SELECT q.o_orderpriority, q.cents,
             CASE WHEN q.cents * 1000000 < b.lo_micro
                  THEN (b.lo_micro + 999999) // 1000000
                  WHEN q.cents * 1000000 > b.hi_micro
                  THEN b.hi_micro // 1000000
                  ELSE q.cents END AS w_cents,
             CASE WHEN q.cents * 1000000 < b.lo_micro THEN 1 ELSE 0 END
               AS clip_lo,
             CASE WHEN q.cents * 1000000 > b.hi_micro THEN 1 ELSE 0 END
               AS clip_hi
      FROM q CROSS JOIN bounds b
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(clip_lo) AS BIGINT) AS n_clipped_low,
           CAST(sum(clip_hi) AS BIGINT) AS n_clipped_high,
           CAST(sum(cents) // count(*) AS BIGINT) AS mean_before_cents,
           CAST(sum(w_cents) // count(*) AS BIGINT) AS mean_after_cents
    FROM clamped GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def quality_winsorize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize order values at exact interpolated p01/p99 (support-
    collapsed CDF): per-priority clip counts and floor-cent means
    before/after."""
    return winsorize_frame(table(spark, sf_dir, "orders"))


def winsorize_frame(orders: DataFrame) -> DataFrame:
    """Frame core of quality_winsorize_orders (scaling-probe entry)."""
    q = orders.select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    sup = q.groupBy(F.col("cents").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    cdf = sup.select(
        "v", F.sum("c").over(W.orderBy("v")).cast("bigint").alias("rn_hi")
    )
    t = sup.agg(F.sum("c").cast("bigint").alias("n"))
    cdf_t = cdf.crossJoin(F.broadcast(t))  # 1-row count

    def pct(qn: int, qd: int, alias: str):
        lo_rank = f"((n - 1) * {qn}) div {qd} + 1"
        frac = f"((n - 1) * {qn}) % {qd}"
        return F.expr(
            f"CAST(min(CASE WHEN rn_hi >= {lo_rank} THEN v END) * 1000000"
            f" + CASE WHEN {frac} = 0 THEN 0"
            f"   ELSE ({frac}) * 1000000 div {qd}"
            f"     * (min(CASE WHEN rn_hi >= {lo_rank} + 1 THEN v END)"
            f"        - min(CASE WHEN rn_hi >= {lo_rank} THEN v END))"
            f"   END AS BIGINT)"
        ).alias(alias)

    # grouped by the constant total-count scalar: exactly ONE group by
    # construction (n is the same on every row), so the broadcast
    # below is 1-row — stated in the tripwire allowlist because the
    # walker only recognizes UNGROUPED aggregates structurally
    bounds = (
        cdf_t.groupBy("n")
        .agg(pct(1, 100, "lo_micro"), pct(99, 100, "hi_micro"))
        .drop("n")
    )
    clamped = q.crossJoin(F.broadcast(bounds)).select(  # 1-row bounds
        "o_orderpriority",
        "cents",
        F.expr(
            "CASE WHEN cents * 1000000 < lo_micro"
            " THEN (lo_micro + 999999) div 1000000"
            " WHEN cents * 1000000 > hi_micro THEN hi_micro div 1000000"
            " ELSE cents END"
        ).alias("w_cents"),
        F.expr(
            "CASE WHEN cents * 1000000 < lo_micro THEN 1 ELSE 0 END"
        ).alias("clip_lo"),
        F.expr(
            "CASE WHEN cents * 1000000 > hi_micro THEN 1 ELSE 0 END"
        ).alias("clip_hi"),
    )
    return (
        clamped.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("clip_lo").cast("bigint").alias("n_clipped_low"),
            F.sum("clip_hi").cast("bigint").alias("n_clipped_high"),
            F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias(
                "mean_before_cents"
            ),
            F.expr("CAST(sum(w_cents) div count(*) AS BIGINT)").alias(
                "mean_after_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )
