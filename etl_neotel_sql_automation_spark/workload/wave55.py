"""Round-8 wave-55 workload: timeseries_pacf — the partial
autocorrelation function of the daily order-count series at lags 1..4,
via the Durbin-Levinson recursion unrolled into closed-form stages.
The forecasting ladder identifies models by eye (Holt / Holt-Winters /
Croston grids); PACF is the IDENTIFICATION readout itself — the
"cut-off at lag p" plot that picks an AR(p) order — and it is the
Yule-Walker solve nothing else in the registry performs. ACF
(timeseries_acf) answers "is there memory?"; PACF answers "how many
AR terms explain it?".

Method: the exact-integer ACF construction from timeseries_acf
(zero-filled calendar, b_t = n*x_t - S centering, BIGINT numerators
C_k and denominator C_0), pivoted to ONE row, then the
Durbin-Levinson recursion unrolled level by level:
  phi_11 = r1
  phi_22 = (r2 - phi_11 r1)/(1 - phi_11 r1),  phi_21 = phi_11(1-phi_22)
  phi_33 = (r3 - phi_21 r2 - phi_22 r1)/(1 - phi_21 r1 - phi_22 r2)
  ... through phi_44,
each level a projection adding columns to the 1-row frame — no
iteration, no collect. Determinism: every r_k is one BIGINT/BIGINT
divide and every phi is the same fixed IEEE expression tree on both
engines (the wave-48 precedent), round(6) at the output.

Scale shape: identical to timeseries_acf — the fact scan collapses to
daily counts (combinable), the calendar explode is a 1-row sequence,
the lag pairing is an integer equi-join on the date-domain-bounded
day frame, and all Durbin-Levinson algebra lives on one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

_PACF_LAGS = 4


def pacf_frame(orders: DataFrame) -> DataFrame:
    """Frame core of timeseries_pacf (scaling-probe entry)."""
    o = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("dn")
    )
    cnt = o.groupBy("dn").agg(F.count("*").alias("x"))
    rng = o.agg(F.min("dn").alias("mn"), F.max("dn").alias("mx"))
    cal = (
        rng.select(F.explode(F.sequence("mn", "mx")).alias("dn"))
        .join(cnt, "dn", "left")
        .select("dn", F.coalesce("x", F.lit(0)).alias("x"))
    )
    scal = cal.agg(
        F.count("*").alias("n"), F.sum("x").cast("bigint").alias("s")
    )
    # the centered day series is date-domain-bounded (~10^3 rows at
    # any corpus size) and feeds both sides of the lag self-join:
    # checkpoint it so the fact tree runs once (the r8 CC lesson)
    b = (
        cal.crossJoin(F.broadcast(scal))
        .select("dn", (F.col("n") * F.col("x") - F.col("s")).alias("b"))
        .localCheckpoint()
    )
    # lag 0 IS the denominator (C_0 = sum b^2): folding it into the
    # lag join removes the separate den branch (wave-7's ACF pays two
    # aggregate passes over b; one grouped pass covers all five C_k)
    lags = F.explode(
        F.array(*[F.lit(i) for i in range(0, _PACF_LAGS + 1)])
    ).alias("lag")
    left = b.select(F.col("dn").alias("adn"), F.col("b").alias("ab"), lags)
    right = b.select(F.col("dn").alias("cdn"), F.col("b").alias("cb"))
    num = (
        left.join(right, F.col("cdn") == F.col("adn") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("ab") * F.col("cb")).cast("bigint").alias("num"))
    )
    piv = num.agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("num")))
            .cast("bigint")
            .alias(f"c{k}")
            for k in range(0, _PACF_LAGS + 1)
        ]
    )
    one = piv.select(
        *[
            F.expr(f"c{k} * 1.0e0 / c0").alias(f"r{k}")
            for k in range(1, _PACF_LAGS + 1)
        ]
    )
    s1 = one.withColumn("p11", F.expr("r1"))
    s2 = s1.withColumn(
        "p22", F.expr("(r2 - p11 * r1) / (1.0e0 - p11 * r1)")
    ).withColumn("p21", F.expr("p11 - p22 * p11"))
    s3 = s2.withColumn(
        "p33",
        F.expr(
            "(r3 - p21 * r2 - p22 * r1) / (1.0e0 - p21 * r1 - p22 * r2)"
        ),
    ).withColumn("p31", F.expr("p21 - p33 * p22")).withColumn(
        "p32", F.expr("p22 - p33 * p21")
    )
    s4 = s3.withColumn(
        "p44",
        F.expr(
            "(r4 - p31 * r3 - p32 * r2 - p33 * r1)"
            " / (1.0e0 - p31 * r1 - p32 * r2 - p33 * r3)"
        ),
    )
    return s4.selectExpr(
        "stack(4,"
        " 1, round(r1, 6), round(p11, 6),"
        " 2, round(r2, 6), round(p22, 6),"
        " 3, round(r3, 6), round(p33, 6),"
        " 4, round(r4, 6), round(p44, 6)"
        ") AS (lag, acf, pacf)"
    ).orderBy("lag")


@query(
    "timeseries_pacf",
    oracle=f"""
    WITH o AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        AS dn
      FROM orders
    ),
    cnt AS (SELECT dn, CAST(count(*) AS BIGINT) AS x FROM o GROUP BY dn),
    rng AS (SELECT min(dn) AS mn, max(dn) AS mx FROM o),
    cal AS (
      SELECT dn, coalesce(x, 0) AS x
      FROM (SELECT unnest(range(mn, mx + 1)) AS dn FROM rng)
      LEFT JOIN cnt USING (dn)
    ),
    scal AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS s FROM cal),
    b AS (SELECT dn, n * x - s AS b FROM cal CROSS JOIN scal),
    den AS (SELECT CAST(sum(b * b) AS BIGINT) AS den FROM b),
    num AS (
      SELECT lag, CAST(sum(a.b * c.b) AS BIGINT) AS num
      FROM b a
      CROSS JOIN (SELECT unnest(range(1, {_PACF_LAGS} + 1)) AS lag) l
      JOIN b c ON c.dn = a.dn + lag
      GROUP BY lag
    ),
    piv AS (
      SELECT max(CASE WHEN lag = 1 THEN num END) AS c1,
             max(CASE WHEN lag = 2 THEN num END) AS c2,
             max(CASE WHEN lag = 3 THEN num END) AS c3,
             max(CASE WHEN lag = 4 THEN num END) AS c4
      FROM num
    ),
    one AS (
      SELECT c1 * 1.0e0 / den AS r1, c2 * 1.0e0 / den AS r2,
             c3 * 1.0e0 / den AS r3, c4 * 1.0e0 / den AS r4
      FROM piv CROSS JOIN den
    ),
    s1 AS (SELECT *, r1 AS p11 FROM one),
    s2 AS (SELECT *, (r2 - p11 * r1) / (1.0e0 - p11 * r1) AS p22 FROM s1),
    s2b AS (SELECT *, p11 - p22 * p11 AS p21 FROM s2),
    s3 AS (SELECT *, (r3 - p21 * r2 - p22 * r1)
                     / (1.0e0 - p21 * r1 - p22 * r2) AS p33 FROM s2b),
    s3b AS (SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32
            FROM s3),
    s4 AS (SELECT *, (r4 - p31 * r3 - p32 * r2 - p33 * r1)
                     / (1.0e0 - p31 * r1 - p32 * r2 - p33 * r3) AS p44
           FROM s3b)
    SELECT 1 AS lag, round(r1, 6) AS acf, round(p11, 6) AS pacf FROM s4
    UNION ALL
    SELECT 2, round(r2, 6), round(p22, 6) FROM s4
    UNION ALL
    SELECT 3, round(r3, 6), round(p33, 6) FROM s4
    UNION ALL
    SELECT 4, round(r4, 6), round(p44, 6) FROM s4
    ORDER BY lag
    """,
)
def timeseries_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily order counts at lags 1..4 via
    the unrolled Durbin-Levinson recursion on the exact-integer sample
    ACF (acf and pacf per lag)."""
    return pacf_frame(table(spark, sf_dir, "orders"))
