"""Round-8 wave-56 workload: events_qini_uplift — the Qini / uplift
curve, the targeting readout the experimentation family still lacked:
events_ab_test says "did treatment lift conversion on AVERAGE";
the uplift curve says "lift for WHOM" — rank users by a targeting
score, then per score-decile compare treated vs control conversion
and accumulate the Qini statistic (incremental conversions vs
targeting depth), the curve that decides whether to roll a treatment
out to everyone or only the top deciles.

Setup (house conventions): arm = user_id parity (the events_ab_test
assignment); converted = the user has any post-split purchase; the
targeting score is the PRE-period event count (the events_cuped
covariate — observable before treatment, so ranking on it is legal),
split at the CUPED boundary. Deciles come from ntile(10) over
(score DESC, user_id) — the unique-key tiebreak makes the binning
deterministic on both engines.

Determinism: counts are exact BIGINTs; cumulative sums run over the
10-row decile frame ordered by decile; rates and uplift in floor-div
ppm; the Qini term — cumulative incremental conversions
cumT - cumC * cumNt/cumNc — is emitted in exact integer MILLI-
conversions via (1000 * (cumT*cumNc - cumC*cumNt)) div cumNc, so no
float touches the curve at all.

Scale shape: one user-keyed combinable aggregate (score, arm,
converted per user), one sort-shuffle for the decile window (rank by
score is a global sort — the same cost sort_topk_orders pays), then
everything lives on the 10-row decile frame. At 100 TB the ntile
window is the only heavy stage and it is exactly one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from .wave20 import _CUPED_SPLIT


def qini_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_qini_uplift (scaling-probe entry)."""
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(
                (F.col("ts") >= split) & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("conv"),
    ).select(
        "*", (F.col("user_id") % 2).cast("int").alias("arm")
    )
    d = u.select(
        "arm",
        "conv",
        F.expr(
            "ntile(10) OVER (ORDER BY score DESC, user_id)"
        ).cast("int").alias("decile"),
    )
    g = d.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_treat"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ctrl"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_treat"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_ctrl"),
    )
    w = "OVER (ORDER BY decile)"
    c = g.select(
        "*",
        F.expr(f"sum(n_treat) {w}").cast("bigint").alias("cnt"),
        F.expr(f"sum(n_ctrl) {w}").cast("bigint").alias("cnc"),
        F.expr(f"sum(conv_treat) {w}").cast("bigint").alias("cct"),
        F.expr(f"sum(conv_ctrl) {w}").cast("bigint").alias("ccc"),
    )
    return c.select(
        "decile",
        "n_treat",
        "n_ctrl",
        "conv_treat",
        "conv_ctrl",
        F.expr(
            "CAST(CASE WHEN n_treat = 0 THEN 0"
            " ELSE (1000000 * conv_treat) div n_treat END AS BIGINT)"
        ).alias("rate_treat_ppm"),
        F.expr(
            "CAST(CASE WHEN n_ctrl = 0 THEN 0"
            " ELSE (1000000 * conv_ctrl) div n_ctrl END AS BIGINT)"
        ).alias("rate_ctrl_ppm"),
        F.expr(
            "CAST(CASE WHEN cnt = 0 OR cnc = 0 THEN 0"
            " ELSE (1000000 * cct) div cnt - (1000000 * ccc) div cnc END"
            " AS BIGINT)"
        ).alias("cum_uplift_ppm"),
        # sign-explicit toward-zero division on BOTH engines: Spark
        # `div` truncates, DuckDB `//` floors — they differ exactly
        # when the Qini numerator goes negative
        F.expr(
            "CAST(CASE WHEN cnc = 0 THEN 0"
            " WHEN cct * cnc - ccc * cnt >= 0"
            " THEN (1000 * (cct * cnc - ccc * cnt)) div cnc"
            " ELSE -((1000 * (ccc * cnt - cct * cnc)) div cnc) END"
            " AS BIGINT)"
        ).alias("qini_milli"),
    ).orderBy("decile")


@query(
    "events_qini_uplift",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}' THEN 1
                           ELSE 0 END) AS BIGINT) AS score,
             CAST(max(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                            AND event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS conv,
             CAST(user_id % 2 AS INTEGER) AS arm
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT arm, conv,
             CAST(ntile(10) OVER (ORDER BY score DESC, user_id)
                  AS INTEGER) AS decile
      FROM u
    ),
    g AS (
      SELECT decile,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treat,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ctrl,
             CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_treat,
             CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_ctrl
      FROM d GROUP BY decile
    ),
    c AS (
      SELECT *,
             CAST(sum(n_treat) OVER (ORDER BY decile) AS BIGINT) AS cnt,
             CAST(sum(n_ctrl) OVER (ORDER BY decile) AS BIGINT) AS cnc,
             CAST(sum(conv_treat) OVER (ORDER BY decile) AS BIGINT) AS cct,
             CAST(sum(conv_ctrl) OVER (ORDER BY decile) AS BIGINT) AS ccc
      FROM g
    )
    SELECT decile, n_treat, n_ctrl, conv_treat, conv_ctrl,
           CAST(CASE WHEN n_treat = 0 THEN 0
                ELSE (1000000 * conv_treat) // n_treat END AS BIGINT)
             AS rate_treat_ppm,
           CAST(CASE WHEN n_ctrl = 0 THEN 0
                ELSE (1000000 * conv_ctrl) // n_ctrl END AS BIGINT)
             AS rate_ctrl_ppm,
           CAST(CASE WHEN cnt = 0 OR cnc = 0 THEN 0
                ELSE (1000000 * cct) // cnt - (1000000 * ccc) // cnc END
                AS BIGINT) AS cum_uplift_ppm,
           CAST(CASE WHEN cnc = 0 THEN 0
                WHEN cct * cnc - ccc * cnt >= 0
                THEN (1000 * (cct * cnc - ccc * cnt)) // cnc
                ELSE -((1000 * (ccc * cnt - cct * cnc)) // cnc) END
                AS BIGINT) AS qini_milli
    FROM c ORDER BY decile
    """,
)
def events_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift curve by pre-period-activity decile: per-decile
    treated/control sizes and conversions, conversion rates (ppm),
    cumulative uplift (ppm) and the exact-integer Qini statistic in
    milli-conversions."""
    return qini_frame(table(spark, sf_dir, "events"))
