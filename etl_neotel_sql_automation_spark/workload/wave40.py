"""Round-7 wave-40 workloads: cooperative cost allocation and the
inventory segmentation matrix —

- alloc_shapley_airport — the airport-game Shapley value in closed
  form: the five order-priority classes share one capacity whose cost
  is the LARGEST class requirement (requirement = the class's max
  order value in cents). The Shapley allocation for the airport game
  has the classic exact form over ascending requirements c_1<=..<=c_n
  (c_0 = 0): share_i = sum_{j<=i} (c_j - c_{j-1}) / (n - j + 1) —
  each increment is split evenly among every class that needs at
  least that much. alloc_largest_remainder and alloc_water_filling
  divide a budget; this divides a COST, with the game-theoretic
  fairness axioms attached. One 5-row aggregate + lag + running sum.
- lineitem_abc_xyz — the ABC-XYZ inventory matrix: parts classed by
  cumulative revenue share (A <= 70%, B <= 95%, C rest, ranked by
  revenue with a key tiebreak) crossed with demand-variability
  classes over monthly quantities (X/Y/Z by the integer dispersion
  CV^2 = (n*sum(q^2) - S^2) / S^2 in ppm, thresholds 0.25 / 1.0 —
  CV^2 avoids the square root no integer oracle can replay). Output:
  the class matrix with part counts and revenue share — the standard
  planning segmentation (steady A-movers get automation, erratic
  Z-tail gets manual review).

Determinism: cents via round(x*100) before any arithmetic; floor
ppm/micro divisions on non-negative operands; the ABC ranking
carries a revenue-then-partkey tiebreak.

Scale notes: shapley is a |priorities|-row frame end to end; abc_xyz
aggregates facts per (part, month) then per part (both map-side
combinable, keyed by the part dimension), and the only global sort is
over parts — a dimension, not the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# alloc_shapley_airport
# ---------------------------------------------------------------------------


def shapley_airport_frame(orders: DataFrame) -> DataFrame:
    """Frame core of alloc_shapley_airport (scaling-probe entry)."""
    req = orders.groupBy("o_orderpriority").agg(
        F.expr("CAST(max(round(o_totalprice * 100)) AS BIGINT)").alias(
            "req_cents"
        )
    )
    w = "OVER (ORDER BY req_cents, o_orderpriority)"
    ranked = req.selectExpr(
        "o_orderpriority AS priority",
        "req_cents",
        f"row_number() {w} AS j",
        f"count(*) OVER () AS n",
        f"coalesce(lag(req_cents) {w}, CAST(0 AS BIGINT)) AS prev_cents",
    )
    return ranked.selectExpr(
        "priority",
        "req_cents",
        "CAST(sum((req_cents - prev_cents) * 1000000 div (n - j + 1))"
        " OVER (ORDER BY j) AS BIGINT) AS shapley_micro_cents",
    ).orderBy("priority")


@query(
    "alloc_shapley_airport",
    oracle="""
    WITH req AS (
      SELECT o_orderpriority,
             CAST(max(round(o_totalprice * 100)) AS BIGINT) AS req_cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT o_orderpriority AS priority, req_cents,
             row_number() OVER w AS j,
             count(*) OVER () AS n,
             coalesce(lag(req_cents) OVER w, CAST(0 AS BIGINT))
               AS prev_cents
      FROM req
      WINDOW w AS (ORDER BY req_cents, o_orderpriority)
    )
    SELECT priority, req_cents,
           CAST(sum((req_cents - prev_cents) * 1000000 // (n - j + 1))
                OVER (ORDER BY j) AS BIGINT) AS shapley_micro_cents
    FROM ranked ORDER BY priority
    """,
)
def alloc_shapley_airport(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Airport-game Shapley cost shares across order-priority classes
    (requirement = class max order value): each capacity increment
    split evenly among the classes that need it, in micro-cents."""
    return shapley_airport_frame(table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# lineitem_abc_xyz
# ---------------------------------------------------------------------------


def abc_xyz_frame(lineitem: DataFrame) -> DataFrame:
    """Frame core of lineitem_abc_xyz (scaling-probe entry)."""
    monthly = (
        lineitem.select(
            "l_partkey",
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias(
                "month"
            ),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
                "rev_cents"
            ),
            # round before the BIGINT cast (Spark truncates, DuckDB
            # rounds — divergent on non-integral quantities, r7 ADVICE)
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("q"),
        )
        .groupBy("l_partkey", "month")
        .agg(
            F.sum("rev_cents").cast("bigint").alias("rev"),
            F.sum("q").cast("bigint").alias("q"),
        )
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.sum("rev").cast("bigint").alias("revenue"),
        F.count("*").cast("bigint").alias("n_months"),
        F.sum("q").cast("bigint").alias("s"),
        F.expr("CAST(sum(q * q) AS BIGINT)").alias("s2"),
    )
    wr = "OVER (ORDER BY revenue DESC, l_partkey)"
    classed = per_part.selectExpr(
        "l_partkey",
        "revenue",
        f"CAST((1000000 * sum(revenue) {wr}) div (sum(revenue) OVER ())"
        " AS BIGINT) AS cum_ppm",
        "CAST((1000000 * (n_months * s2 - s * s))"
        " div greatest(1, s * s) AS BIGINT) AS disp_ppm",
    ).selectExpr(
        "l_partkey",
        "revenue",
        "CASE WHEN cum_ppm <= 700000 THEN 'A'"
        " WHEN cum_ppm <= 950000 THEN 'B' ELSE 'C' END AS abc_class",
        "CASE WHEN disp_ppm < 250000 THEN 'X'"
        " WHEN disp_ppm < 1000000 THEN 'Y' ELSE 'Z' END AS xyz_class",
    )
    return (
        classed.groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("revenue").cast("bigint").alias("revenue_cents"),
        )
        .selectExpr(
            "abc_class",
            "xyz_class",
            "n_parts",
            "revenue_cents",
            "CAST((1000000 * revenue_cents) div (sum(revenue_cents)"
            " OVER ()) AS BIGINT) AS revenue_share_ppm",
        )
        .orderBy("abc_class", "xyz_class")
    )


@query(
    "lineitem_abc_xyz",
    oracle="""
    WITH monthly AS (
      SELECT l_partkey,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS rev,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(sum(rev) AS BIGINT) AS revenue,
             CAST(count(*) AS BIGINT) AS n_months,
             CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS s2
      FROM monthly GROUP BY 1
    ),
    classed AS (
      SELECT l_partkey, revenue,
             CASE WHEN cum_ppm <= 700000 THEN 'A'
                  WHEN cum_ppm <= 950000 THEN 'B' ELSE 'C' END AS abc_class,
             CASE WHEN disp_ppm < 250000 THEN 'X'
                  WHEN disp_ppm < 1000000 THEN 'Y' ELSE 'Z' END AS xyz_class
      FROM (
        SELECT l_partkey, revenue,
               CAST((1000000 * sum(revenue)
                     OVER (ORDER BY revenue DESC, l_partkey))
                    // (sum(revenue) OVER ()) AS BIGINT) AS cum_ppm,
               CAST((1000000 * (n_months * s2 - s * s))
                    // greatest(1, s * s) AS BIGINT) AS disp_ppm
        FROM per_part
      )
    )
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(revenue) AS BIGINT) AS revenue_cents,
           CAST((1000000 * sum(revenue)) // (sum(sum(revenue)) OVER ())
                AS BIGINT) AS revenue_share_ppm
    FROM classed GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def lineitem_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory segmentation: cumulative-revenue classes
    crossed with monthly-demand dispersion classes (integer CV^2),
    with part counts and revenue share per cell."""
    return abc_xyz_frame(table(spark, sf_dir, "lineitem"))
