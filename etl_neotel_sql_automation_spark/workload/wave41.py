"""Round-8 wave-41 workload: the experimentation stack composed
end-to-end — the analytics counterpart of pretrain_pipeline_e2e
(corpus_mining.py): sessionize -> session-scoped funnel -> CUPED
adjustment -> SPRT + power readout as ONE oracle-paired query, proving
the operators compose without a stage-boundary pathology (the r7
VERDICT item 5).

Pipeline stages, each FEEDING the next (not a union of independents):

1. Sessionize: 30-minute-gap sessions per user (the sessionize_events
   semantics: lag-gap flag + running sum over (ts, event_id)).
2. Session funnel: a session converts when it contains a signup and a
   LATER purchase in the SAME session; a user converts when any of
   their sessions does. This is stage 1's output driving the funnel —
   the cross-session funnel (events_funnel) cannot see session scope.
3. CUPED: per-user pre/post value sums split at Jan 16 (the
   events_cuped_adjustment split), arm = user_id parity, pooled theta
   from exact cent moment sums, adjusted arm means.
4. Readout: Wald SPRT on the treatment arm's stage-2 conversions
   (pinned H0 p=0.20 vs H1 p=0.26, alpha=beta=0.05 — the
   events_sprt_monitor constants) plus the absolute MDE at the
   current arm sizes (the events_power_mde closed form, z constants
   pinned).

Scale shape: one events shuffle by user_id feeds the session window;
the session aggregate (user_id, session_id) and the user aggregate
(user_id) both reuse that partitioning (hash on user_id satisfies the
clustered distribution of any superset key), so stages 1-3 ride ONE
exchange; the arm aggregate is a 2-key shuffle; every pooled scalar
(theta moments, SPRT counts, MDE terms) is an unpartitioned window
over the 2-row arm frame — the r7 pooled-window lesson, so nothing
recomputes the event tree.

Determinism rules (house style): cents via round(value*100); moment
closed forms in DECIMAL(38,0)/HUGEINT with round(..., 6) finals (the
CUPED precedent); conversion shares in floor-div ppm; SPRT increments
micro-nat-rounded from pinned literals on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table
from .wave20 import _CUPED_SPLIT, _Z_SUM

_GAP_US = 1_800_000_000  # 30 minutes, the sessionize_events gap


def experiment_pipeline_frame(ev: DataFrame) -> DataFrame:
    """Frame core of experiment_pipeline_e2e (scaling-probe entry)."""
    # stage 1: sessionize (lag-gap + running session counter)
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", "event_id", "ts", "event_type", "value"
    ).withColumn(
        "new_sess",
        F.when(
            F.lag(F.unix_micros("ts")).over(wu).isNull()
            | (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
                > _GAP_US
            ),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "session_id",
        F.sum("new_sess")
        .over(wu.rowsBetween(W.unboundedPreceding, 0))
        .cast("int"),
    )
    # stage 2: session-scoped funnel + per-session value splits
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    sess = s.groupBy("user_id", "session_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("su"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("pu"),
        F.sum(F.when(F.col("ts") < split, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("pre"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("post"),
    )
    u = sess.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.max(
            F.when(
                F.col("su").isNotNull()
                & F.col("pu").isNotNull()
                & (F.col("pu") > F.col("su")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("converted"),
        F.sum("pre").cast("bigint").alias("pre"),
        F.sum("post").cast("bigint").alias("post"),
    ).withColumn("arm", (F.col("user_id") % 2).cast("int"))
    # stage 3: arm aggregate carrying the exact moment sums
    dec = "DECIMAL(38,0)"
    arm = u.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("n_sessions").cast("bigint").alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_conv"),
        F.sum("pre").cast("bigint").alias("pre_sum"),
        F.sum("post").cast("bigint").alias("post_sum"),
        F.sum(F.expr(f"CAST(pre AS {dec}) * pre")).cast(dec).alias("sxx_a"),
        F.sum(F.expr(f"CAST(post AS {dec}) * post")).cast(dec).alias("syy_a"),
        F.sum(F.expr(f"CAST(pre AS {dec}) * post")).cast(dec).alias("sxy_a"),
    )
    # stage 4: pooled scalars as unpartitioned windows over the 2-row
    # arm frame (theta moments, SPRT counts, MDE terms) — one pass
    armw = arm.select(
        "*",
        F.expr("sum(n_users) OVER ()").alias("n"),
        F.expr("sum(pre_sum) OVER ()").alias("sx"),
        F.expr("sum(post_sum) OVER ()").alias("sy"),
        F.expr("sum(sxx_a) OVER ()").alias("sxx"),
        F.expr("sum(syy_a) OVER ()").alias("syy"),
        F.expr("sum(sxy_a) OVER ()").alias("sxy"),
        F.expr("sum(n_conv) OVER ()").alias("conv_all"),
        F.expr(
            "sum(CASE WHEN arm = 1 THEN n_conv END) OVER ()"
        ).alias("t_conv"),
        F.expr(
            "sum(CASE WHEN arm = 1 THEN n_users - n_conv END) OVER ()"
        ).alias("t_miss"),
        F.expr(
            "sum(CASE WHEN arm = 0 THEN n_users END) OVER ()"
        ).alias("n0"),
        F.expr(
            "sum(CASE WHEN arm = 1 THEN n_users END) OVER ()"
        ).alias("n1"),
    )
    covn = f"CAST(n * sxy - CAST(sx AS {dec}) * sy AS DOUBLE)"
    varxn = f"CAST(n * sxx - CAST(sx AS {dec}) * sx AS DOUBLE)"
    w_conv = "CAST(round(ln(0.26e0 / 0.20e0) * 1.0e6) AS BIGINT)"
    w_miss = "CAST(round(ln(0.74e0 / 0.80e0) * 1.0e6) AS BIGINT)"
    upper = "CAST(round(ln(19.0e0) * 1.0e6) AS BIGINT)"
    p = "(conv_all * 1.0e0 / n)"
    return armw.select(
        "arm",
        "n_users",
        "n_sessions",
        "n_conv",
        F.expr("CAST((1000000 * n_conv) div n_users AS BIGINT)").alias(
            "conv_ppm"
        ),
        F.expr("round(post_sum * 1.0e0 / n_users, 6)").alias(
            "post_mean_cents"
        ),
        F.expr(
            f"round(post_sum * 1.0e0 / n_users - ({covn} / {varxn})"
            " * (pre_sum * 1.0e0 / n_users - sx * 1.0e0 / n), 6)"
        ).alias("adjusted_mean_cents"),
        F.expr(f"round({covn} / {varxn}, 6)").alias("theta"),
        F.expr(
            f"CAST(t_conv * ({w_conv}) + t_miss * ({w_miss}) AS BIGINT)"
        ).alias("llr_micronats"),
        F.expr(
            f"CASE WHEN t_conv * ({w_conv}) + t_miss * ({w_miss})"
            f" >= ({upper}) THEN 'ACCEPT_H1'"
            f" WHEN t_conv * ({w_conv}) + t_miss * ({w_miss})"
            f" <= -({upper}) THEN 'ACCEPT_H0'"
            " ELSE 'CONTINUE' END"
        ).alias("sprt_decision"),
        F.expr(
            f"round({_Z_SUM} * sqrt({p} * (1.0e0 - {p})"
            " * (1.0e0 / n0 + 1.0e0 / n1)), 6)"
        ).alias("mde_abs"),
    ).orderBy("arm")


@query(
    "experiment_pipeline_e2e",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, event_type, value,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_type, value,
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
      FROM g
    ),
    sess AS (
      SELECT user_id, session_id,
             min(CASE WHEN event_type = 'signup'
                      THEN epoch_us(ts) END) AS su,
             max(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) END) AS pu,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post
      FROM s GROUP BY user_id, session_id
    ),
    u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
             CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(max(CASE WHEN su IS NOT NULL AND pu IS NOT NULL
                            AND pu > su THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted,
             CAST(sum(pre) AS BIGINT) AS pre,
             CAST(sum(post) AS BIGINT) AS post
      FROM sess GROUP BY user_id
    ),
    arm AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_sessions) AS BIGINT) AS n_sessions,
             CAST(sum(converted) AS BIGINT) AS n_conv,
             CAST(sum(pre) AS BIGINT) AS pre_sum,
             CAST(sum(post) AS BIGINT) AS post_sum,
             CAST(sum(CAST(pre AS HUGEINT) * pre) AS HUGEINT) AS sxx_a,
             CAST(sum(CAST(post AS HUGEINT) * post) AS HUGEINT) AS syy_a,
             CAST(sum(CAST(pre AS HUGEINT) * post) AS HUGEINT) AS sxy_a
      FROM u GROUP BY arm
    ),
    armw AS (
      SELECT *,
             sum(n_users) OVER () AS n,
             sum(pre_sum) OVER () AS sx,
             sum(post_sum) OVER () AS sy,
             sum(sxx_a) OVER () AS sxx,
             sum(syy_a) OVER () AS syy,
             sum(sxy_a) OVER () AS sxy,
             sum(n_conv) OVER () AS conv_all,
             sum(CASE WHEN arm = 1 THEN n_conv END) OVER () AS t_conv,
             sum(CASE WHEN arm = 1 THEN n_users - n_conv END) OVER ()
               AS t_miss,
             sum(CASE WHEN arm = 0 THEN n_users END) OVER () AS n0,
             sum(CASE WHEN arm = 1 THEN n_users END) OVER () AS n1
      FROM arm
    )
    SELECT arm, n_users, n_sessions, n_conv,
           CAST((1000000 * n_conv) // n_users AS BIGINT) AS conv_ppm,
           round(post_sum * 1.0e0 / n_users, 6) AS post_mean_cents,
           round(post_sum * 1.0e0 / n_users
                 - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                    / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                   * (pre_sum * 1.0e0 / n_users - sx * 1.0e0 / n), 6)
             AS adjusted_mean_cents,
           round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
             AS theta,
           CAST(t_conv * CAST(round(ln(0.26e0 / 0.20e0) * 1.0e6) AS BIGINT)
                + t_miss * CAST(round(ln(0.74e0 / 0.80e0) * 1.0e6) AS BIGINT)
                AS BIGINT) AS llr_micronats,
           CASE WHEN t_conv * CAST(round(ln(0.26e0 / 0.20e0) * 1.0e6)
                               AS BIGINT)
                     + t_miss * CAST(round(ln(0.74e0 / 0.80e0) * 1.0e6)
                                     AS BIGINT)
                     >= CAST(round(ln(19.0e0) * 1.0e6) AS BIGINT)
                THEN 'ACCEPT_H1'
                WHEN t_conv * CAST(round(ln(0.26e0 / 0.20e0) * 1.0e6)
                               AS BIGINT)
                     + t_miss * CAST(round(ln(0.74e0 / 0.80e0) * 1.0e6)
                                     AS BIGINT)
                     <= -CAST(round(ln(19.0e0) * 1.0e6) AS BIGINT)
                THEN 'ACCEPT_H0'
                ELSE 'CONTINUE' END AS sprt_decision,
           round({_Z_SUM} * sqrt((conv_all * 1.0e0 / n)
                                 * (1.0e0 - conv_all * 1.0e0 / n)
                                 * (1.0e0 / n0 + 1.0e0 / n1)), 6) AS mde_abs
    FROM armw ORDER BY arm
    """,
)
def experiment_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize -> session funnel -> CUPED -> SPRT/MDE readout as one
    composed query: per arm the user/session/conversion counts, raw and
    CUPED-adjusted post-period means, and the pooled sequential-test
    and power numbers."""
    return experiment_pipeline_frame(table(spark, sf_dir, "events"))
