"""Round-8 wave-48 workload: events_welch_ttest — the classical
unequal-variance two-sample readout completing the experimentation
family (events_ab_test covers the conversion-rate z-test; CUPED the
variance-reduced mean; DiD the pre-period-differenced mean; SPRT the
sequential monitor): Welch's t on per-user total value between arms,
with the Welch-Satterthwaite degrees of freedom — the df is what makes
the unequal-variance test honest when one arm's spend distribution is
heavier, and no other registered query computes it.

Determinism (house style): per-user value in exact BIGINT cents,
per-arm moment sums in DECIMAL(38,0)/HUGEINT, every float produced by
the same closed form over the same integers on both engines,
round(..., 6) finals — EXCEPT var_cents2, rounded to 2 (its ~1e9
magnitude puts 6 decimals past double reproducibility; a last-ulp
JVM/DuckDB divergence surfaced at sf0.1 and is pinned in the inline
comment).

Scale shape: one user-keyed combinable aggregate into a 2-row arm
frame; every pooled scalar (diff, SE, t, df) is an unpartitioned
window over those 2 rows (the r7 pooled-window lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table


def welch_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_welch_ttest (scaling-probe entry)."""
    u = ev.groupBy("user_id").agg(
        F.expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
        .alias("v")
    )
    return welch_readout(u)


def welch_readout(u: DataFrame) -> DataFrame:
    """Welch readout over a per-user (user_id, v) cents frame — shared
    verbatim by the batch query and the streaming monitor (wave-61),
    which materializes `u` as genuine streaming state."""
    u = u.select((F.col("user_id") % 2).cast("int").alias("arm"), "v")
    dec = "DECIMAL(38,0)"
    arm = u.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.expr(f"CAST(v AS {dec}) * v")).cast(dec).alias("ss"),
    )
    armw = arm.select(
        "*",
        F.expr("sum(CASE WHEN arm = 0 THEN n_users END) OVER ()").alias("na"),
        F.expr("sum(CASE WHEN arm = 1 THEN n_users END) OVER ()").alias("nb"),
        F.expr("sum(CASE WHEN arm = 0 THEN s END) OVER ()").alias("sa"),
        F.expr("sum(CASE WHEN arm = 1 THEN s END) OVER ()").alias("sb"),
        F.expr("sum(CASE WHEN arm = 0 THEN ss END) OVER ()").alias("ssa"),
        F.expr("sum(CASE WHEN arm = 1 THEN ss END) OVER ()").alias("ssb"),
    )
    va = (
        f"(CAST(na * ssa - CAST(sa AS {dec}) * sa AS DOUBLE)"
        " / (na * (na - 1.0e0)))"
    )
    vb = (
        f"(CAST(nb * ssb - CAST(sb AS {dec}) * sb AS DOUBLE)"
        " / (nb * (nb - 1.0e0)))"
    )
    qa, qb = f"({va} / na)", f"({vb} / nb)"
    diff = "(sb * 1.0e0 / nb - sa * 1.0e0 / na)"
    se = f"sqrt({qa} + {qb})"
    df = (
        f"(({qa} + {qb}) * ({qa} + {qb})"
        f" / ({qa} * {qa} / (na - 1.0e0) + {qb} * {qb} / (nb - 1.0e0)))"
    )
    return armw.select(
        "arm",
        "n_users",
        F.expr("round(s * 1.0e0 / n_users, 6)").alias("mean_cents"),
        # round-2, not the house round-6: variance in cents^2 sits at
        # ~1e9+, where 6 decimals demands 16 significant digits — past
        # double reproducibility (a last-ulp JVM/DuckDB divergence
        # surfaced at sf0.1); 2 decimals stays within 12
        F.expr(
            f"round(CAST(n_users * ss - CAST(s AS {dec}) * s AS DOUBLE)"
            " / (n_users * (n_users - 1.0e0)), 2)"
        ).alias("var_cents2"),
        F.expr(f"round({diff}, 6)").alias("diff_cents"),
        F.expr(f"round({se}, 6)").alias("se_cents"),
        F.expr(f"round({diff} / ({se}), 6)").alias("t_stat"),
        F.expr(f"round({df}, 6)").alias("welch_df"),
    ).orderBy("arm")


WELCH_ORACLE = """
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY user_id
    ),
    arm AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS ss
      FROM u GROUP BY 1
    ),
    armw AS (
      SELECT *,
             sum(CASE WHEN arm = 0 THEN n_users END) OVER () AS na,
             sum(CASE WHEN arm = 1 THEN n_users END) OVER () AS nb,
             sum(CASE WHEN arm = 0 THEN s END) OVER () AS sa,
             sum(CASE WHEN arm = 1 THEN s END) OVER () AS sb,
             sum(CASE WHEN arm = 0 THEN ss END) OVER () AS ssa,
             sum(CASE WHEN arm = 1 THEN ss END) OVER () AS ssb
      FROM arm
    )
    SELECT arm, n_users,
           round(s * 1.0e0 / n_users, 6) AS mean_cents,
           round(CAST(n_users * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / (n_users * (n_users - 1.0e0)), 2) AS var_cents2,
           round(sb * 1.0e0 / nb - sa * 1.0e0 / na, 6) AS diff_cents,
           round(sqrt(
             (CAST(na * ssa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
              / (na * (na - 1.0e0))) / na
             + (CAST(nb * ssb - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                / (nb * (nb - 1.0e0))) / nb), 6) AS se_cents,
           round((sb * 1.0e0 / nb - sa * 1.0e0 / na)
                 / sqrt(
                   (CAST(na * ssa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                    / (na * (na - 1.0e0))) / na
                   + (CAST(nb * ssb - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                      / (nb * (nb - 1.0e0))) / nb), 6) AS t_stat,
           round(
             ((CAST(na * ssa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
               / (na * (na - 1.0e0))) / na
              + (CAST(nb * ssb - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                 / (nb * (nb - 1.0e0))) / nb)
             * ((CAST(na * ssa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                 / (na * (na - 1.0e0))) / na
                + (CAST(nb * ssb - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                   / (nb * (nb - 1.0e0))) / nb)
             / (((CAST(na * ssa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                  / (na * (na - 1.0e0))) / na)
                * ((CAST(na * ssa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                    / (na * (na - 1.0e0))) / na) / (na - 1.0e0)
                + ((CAST(nb * ssb - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                    / (nb * (nb - 1.0e0))) / nb)
                  * ((CAST(nb * ssb - CAST(sb AS HUGEINT) * sb AS DOUBLE)
                      / (nb * (nb - 1.0e0))) / nb) / (nb - 1.0e0)), 6)
             AS welch_df
    FROM armw ORDER BY arm
    """


@query("events_welch_ttest", oracle=WELCH_ORACLE)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-user total value between
    arms: per-arm mean/variance, the mean difference, its SE, the t
    statistic, and the Welch-Satterthwaite degrees of freedom."""
    return welch_frame(table(spark, sf_dir, "events"))
