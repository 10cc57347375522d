"""Round-8 wave-62 workload: events_ips_offpolicy — counterfactual
(off-policy) evaluation from logged experiment data: the IPS and SNIPS
estimates of what a NEW targeting policy would earn, computed from the
randomized A/B log without ever running the policy. This is the
modern ML-ops readout the experimentation family lacked — uplift
(wave-56) ranks who responds; off-policy evaluation prices a concrete
decision rule before deployment.

Setup: the logged assignment is the user_id-parity arm with known
propensity 1/2 per arm (exact, by construction). The candidate policy
is deterministic: "treat exactly the users with pre-period activity
>= 5 events" (the CUPED-covariate threshold rule — observable
pre-treatment). IPS: value_hat = (1/N) sum_u 1{pi(x_u) = a_u} *
v_u / (1/2) = 2 * sum(matched v) / N. SNIPS normalizes by the
realized weight mass: sum(matched v) / sum(matched * 1/2) — i.e. the
matched mean. Both are floor-div micro-cent integers from exact
BIGINT sums; the diagnostic effective sample size
ESS = (sum w)^2 / sum w^2 collapses to n_matched for constant
weights and is emitted as the match COUNT plus its ppm share (the
overlap diagnostic every OPE report carries).

Scale shape: one user-keyed combinable aggregate (pre-count, post
value, arm), one 1-row total — two exchanges, no joins, nothing
data-scaled after the user frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from .wave20 import _CUPED_SPLIT

_POLICY_MIN_PRE = 5


def ips_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_ips_offpolicy (scaling-probe entry)."""
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
        .cast("bigint")
        .alias("pre_n"),
        F.expr(
            "CAST(sum(CASE WHEN NOT (ts < TIMESTAMP"
            f" '{_CUPED_SPLIT}') THEN CAST(round(value * 100) AS BIGINT)"
            " ELSE 0 END) AS BIGINT)"
        ).alias("v"),
    ).select(
        "v",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.when(F.col("pre_n") >= _POLICY_MIN_PRE, 1)
        .otherwise(0)
        .cast("int")
        .alias("pi_arm"),
    )
    t = u.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("arm") == F.col("pi_arm"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_matched"),
        F.sum(
            F.when(F.col("arm") == F.col("pi_arm"), F.col("v")).otherwise(0)
        )
        .cast("bigint")
        .alias("s_matched"),
        F.sum(F.when(F.col("pi_arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_policy_treat"),
        F.sum("v").cast("bigint").alias("s_all"),
    )
    return t.select(
        "n_users",
        "n_matched",
        "n_policy_treat",
        F.expr(
            "CAST((1000000 * n_matched) div n_users AS BIGINT)"
        ).alias("match_share_ppm"),
        # IPS: 2 * matched value / N (propensity exactly 1/2)
        F.expr(
            "CAST((1000000 * 2 * s_matched) div n_users AS BIGINT)"
        ).alias("ips_value_micro"),
        # SNIPS: matched value / matched weight mass = matched mean
        F.expr(
            "CAST(CASE WHEN n_matched = 0 THEN 0"
            " ELSE (1000000 * s_matched) div n_matched END AS BIGINT)"
        ).alias("snips_value_micro"),
        # the logged (behavior) average for comparison
        F.expr(
            "CAST((1000000 * s_all) div n_users AS BIGINT)"
        ).alias("logged_value_micro"),
    )


@query(
    "events_ips_offpolicy",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}' THEN 1
                           ELSE 0 END) AS BIGINT) AS pre_n,
             CAST(sum(CASE WHEN NOT (ts < TIMESTAMP '{_CUPED_SPLIT}')
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS v
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT v, CAST(user_id % 2 AS INTEGER) AS arm,
             CASE WHEN pre_n >= {_POLICY_MIN_PRE} THEN 1 ELSE 0 END
               AS pi_arm
      FROM u
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN arm = pi_arm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matched,
             CAST(sum(CASE WHEN arm = pi_arm THEN v ELSE 0 END) AS BIGINT)
               AS s_matched,
             CAST(sum(CASE WHEN pi_arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_policy_treat,
             CAST(sum(v) AS BIGINT) AS s_all
      FROM p
    )
    SELECT n_users, n_matched, n_policy_treat,
           CAST((1000000 * n_matched) // n_users AS BIGINT)
             AS match_share_ppm,
           CAST((1000000 * 2 * s_matched) // n_users AS BIGINT)
             AS ips_value_micro,
           CAST(CASE WHEN n_matched = 0 THEN 0
                ELSE (1000000 * s_matched) // n_matched END AS BIGINT)
             AS snips_value_micro,
           CAST((1000000 * s_all) // n_users AS BIGINT)
             AS logged_value_micro
    FROM t
    """,
)
def events_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation of a deterministic targeting rule from
    the randomized log: IPS and SNIPS value estimates in exact
    micro-cents, the match-share overlap diagnostic, and the logged
    behavior average."""
    return ips_frame(table(spark, sf_dir, "events"))
