"""Round-8 wave-42 workloads: the two experimentation guardrails every
platform runs before reading a test, completing the stack wave-41
composed — sample-ratio-mismatch (SRM) and difference-in-differences:

- events_srm_check — the assignment-health guardrail: distinct users
  per arm vs the expected 50/50 split, the 1-dof chi-square statistic,
  and the standing verdict at the industry thresholds (p < 0.05 and
  the p < 0.001 SRM alarm). A mismatched ratio invalidates every
  downstream readout (CUPED, SPRT, DiD alike) — this is the first
  gate, not a nicety.
- events_diff_in_diff — the panel DiD estimator on per-user value:
  each user's post-minus-pre cent delta (the Jan 16 CUPED split), the
  treatment-vs-control difference of arm mean deltas, its standard
  error from per-arm sample variances, and the t statistic. The
  pre-period differences out any static arm imbalance CUPED models
  with a covariate.

Determinism rules (house style): chi-square for the 50/50 split is
EXACT integer arithmetic — (n0 - n1)^2 * 1e6 div n, floor division on
both engines; decision thresholds are pinned micro literals (3841459 =
chi2_{1,0.95}, 10827566 = chi2_{1,0.999}); DiD moment sums are exact
BIGINT cents with DECIMAL(38,0)/HUGEINT squares, floats only in the
final closed forms, round(..., 6).

Scale shape: both are one user-keyed combinable aggregate into a
2-row arm frame; every pooled scalar (chi2, DiD, SE) is an
unpartitioned window over those 2 rows (the r7 pooled-window lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from .wave20 import _CUPED_SPLIT

# chi2 inverse-CDF constants at 1 dof, micro units, pinned literals:
# qchisq(.95, 1) = 3.841459, qchisq(.999, 1) = 10.827566
_SRM_95_MICRO = 3_841_459
_SRM_999_MICRO = 10_827_566


def srm_readout(arm: DataFrame) -> DataFrame:
    """The SRM display layer over a 2-row (arm, n_users) frame —
    shared by the batch query and the streaming monitor (the stream
    maintains the per-arm distinct-user state; the chart layer derives
    chi-square and the verdict)."""
    armw = arm.select(
        "arm",
        "n_users",
        F.expr("sum(n_users) OVER ()").alias("n"),
        F.expr("sum(CASE WHEN arm = 0 THEN n_users END) OVER ()").alias("n0"),
        F.expr("sum(CASE WHEN arm = 1 THEN n_users END) OVER ()").alias("n1"),
    )
    return armw.select(
        "arm",
        "n_users",
        F.expr("CAST((1000000 * n_users) div n AS BIGINT)").alias(
            "share_ppm"
        ),
        # exact: sum over arms of (o - n/2)^2 / (n/2) = (n0 - n1)^2 / n
        F.expr(
            "CAST(((n0 - n1) * (n0 - n1) * 1000000) div n AS BIGINT)"
        ).alias("chi2_micro"),
        F.expr(
            f"CASE WHEN ((n0 - n1) * (n0 - n1) * 1000000) div n"
            f" >= {_SRM_999_MICRO} THEN 'SRM_ALARM'"
            f" WHEN ((n0 - n1) * (n0 - n1) * 1000000) div n"
            f" >= {_SRM_95_MICRO} THEN 'SUSPECT'"
            " ELSE 'OK' END"
        ).alias("verdict"),
    ).orderBy("arm")


def srm_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_srm_check (scaling-probe entry)."""
    arm = (
        ev.select((F.col("user_id") % 2).cast("int").alias("arm"), "user_id")
        .groupBy("arm")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )
    return srm_readout(arm)


SRM_ORACLE = f"""
    WITH arm AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS arm,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1
    ),
    armw AS (
      SELECT arm, n_users,
             sum(n_users) OVER () AS n,
             sum(CASE WHEN arm = 0 THEN n_users END) OVER () AS n0,
             sum(CASE WHEN arm = 1 THEN n_users END) OVER () AS n1
      FROM arm
    )
    SELECT arm, n_users,
           CAST((1000000 * n_users) // n AS BIGINT) AS share_ppm,
           CAST(((n0 - n1) * (n0 - n1) * 1000000) // n AS BIGINT)
             AS chi2_micro,
           CASE WHEN ((n0 - n1) * (n0 - n1) * 1000000) // n
                     >= {_SRM_999_MICRO} THEN 'SRM_ALARM'
                WHEN ((n0 - n1) * (n0 - n1) * 1000000) // n
                     >= {_SRM_95_MICRO} THEN 'SUSPECT'
                ELSE 'OK' END AS verdict
    FROM armw ORDER BY arm
    """


@query("events_srm_check", oracle=SRM_ORACLE)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: per-arm distinct users vs the
    expected 50/50, exact 1-dof chi-square in micro units, and the
    standing verdict at pinned p<.05 / p<.001 thresholds."""
    return srm_frame(table(spark, sf_dir, "events"))


def did_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_diff_in_diff (scaling-probe entry)."""
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("pre"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("post"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        "pre",
        "post",
        (F.col("post") - F.col("pre")).alias("d"),
    )
    dec = "DECIMAL(38,0)"
    arm = u.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("pre").cast("bigint").alias("pre_sum"),
        F.sum("post").cast("bigint").alias("post_sum"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.expr(f"CAST(d AS {dec}) * d")).cast(dec).alias("sdd"),
    )
    armw = arm.select(
        "*",
        F.expr("sum(CASE WHEN arm = 0 THEN n_users END) OVER ()").alias("na"),
        F.expr("sum(CASE WHEN arm = 1 THEN n_users END) OVER ()").alias("nb"),
        F.expr("sum(CASE WHEN arm = 0 THEN sd END) OVER ()").alias("sda"),
        F.expr("sum(CASE WHEN arm = 1 THEN sd END) OVER ()").alias("sdb"),
        F.expr("sum(CASE WHEN arm = 0 THEN sdd END) OVER ()").alias("sdda"),
        F.expr("sum(CASE WHEN arm = 1 THEN sdd END) OVER ()").alias("sddb"),
    )
    var_a = (
        f"(CAST(na * sdda - CAST(sda AS {dec}) * sda AS DOUBLE)"
        " / (na * (na - 1.0e0)))"
    )
    var_b = (
        f"(CAST(nb * sddb - CAST(sdb AS {dec}) * sdb AS DOUBLE)"
        " / (nb * (nb - 1.0e0)))"
    )
    did = "(sdb * 1.0e0 / nb - sda * 1.0e0 / na)"
    se = f"sqrt({var_b} / nb + {var_a} / na)"
    return armw.select(
        "arm",
        "n_users",
        F.expr("round(pre_sum * 1.0e0 / n_users, 6)").alias(
            "pre_mean_cents"
        ),
        F.expr("round(post_sum * 1.0e0 / n_users, 6)").alias(
            "post_mean_cents"
        ),
        F.expr("round(sd * 1.0e0 / n_users, 6)").alias("delta_mean_cents"),
        F.expr(f"round({did}, 6)").alias("did_cents"),
        F.expr(f"round({se}, 6)").alias("se_cents"),
        F.expr(f"round({did} / ({se}), 6)").alias("t_stat"),
    ).orderBy("arm")


@query(
    "events_diff_in_diff",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS arm, pre, post,
             post - pre AS d
      FROM u
    ),
    arm AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(pre) AS BIGINT) AS pre_sum,
             CAST(sum(post) AS BIGINT) AS post_sum,
             CAST(sum(d) AS BIGINT) AS sd,
             CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd
      FROM d GROUP BY arm
    ),
    armw AS (
      SELECT *,
             sum(CASE WHEN arm = 0 THEN n_users END) OVER () AS na,
             sum(CASE WHEN arm = 1 THEN n_users END) OVER () AS nb,
             sum(CASE WHEN arm = 0 THEN sd END) OVER () AS sda,
             sum(CASE WHEN arm = 1 THEN sd END) OVER () AS sdb,
             sum(CASE WHEN arm = 0 THEN sdd END) OVER () AS sdda,
             sum(CASE WHEN arm = 1 THEN sdd END) OVER () AS sddb
      FROM arm
    )
    SELECT arm, n_users,
           round(pre_sum * 1.0e0 / n_users, 6) AS pre_mean_cents,
           round(post_sum * 1.0e0 / n_users, 6) AS post_mean_cents,
           round(sd * 1.0e0 / n_users, 6) AS delta_mean_cents,
           round(sdb * 1.0e0 / nb - sda * 1.0e0 / na, 6) AS did_cents,
           round(sqrt(
             (CAST(nb * sddb - CAST(sdb AS HUGEINT) * sdb AS DOUBLE)
              / (nb * (nb - 1.0e0))) / nb
             + (CAST(na * sdda - CAST(sda AS HUGEINT) * sda AS DOUBLE)
                / (na * (na - 1.0e0))) / na), 6) AS se_cents,
           round((sdb * 1.0e0 / nb - sda * 1.0e0 / na)
                 / sqrt(
                   (CAST(nb * sddb - CAST(sdb AS HUGEINT) * sdb AS DOUBLE)
                    / (nb * (nb - 1.0e0))) / nb
                   + (CAST(na * sdda - CAST(sda AS HUGEINT) * sda AS DOUBLE)
                      / (na * (na - 1.0e0))) / na), 6) AS t_stat
    FROM armw ORDER BY arm
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panel difference-in-differences on per-user value: arm mean
    post-minus-pre deltas, the DiD point estimate, its SE from per-arm
    sample variances, and the t statistic."""
    return did_frame(table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# streaming_srm_monitor — the SRM guardrail as a live streaming monitor
# (the production shape: assignment health alarms DURING the test).
# Conscious tripwire exclusion; policy test:
# tests/test_wave42.py::test_streaming_srm_equals_batch.
# ---------------------------------------------------------------------------


@query("streaming_srm_monitor", oracle=SRM_ORACLE)
def streaming_srm_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of streaming.landing.stream_srm_monitor:
    per-user dedup + per-arm counts as genuine streaming state,
    chi-square verdict applied display-side — checked against
    events_srm_check's oracle verbatim."""
    from ..streaming.landing import stream_srm_monitor

    return stream_srm_monitor(spark, sf_dir)
