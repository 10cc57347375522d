"""Round-8 wave-69 workload: events_event_study — the event-study
(leads-and-lags) readout around a staggered treatment:
events_diff_in_diff compresses "did the outcome move after
treatment" into ONE number with a pinned calendar split; the event
study is its modern panel generalization — align every treated user
on their OWN treatment week (first signup), trace the outcome by
RELATIVE week tau in [-3, +3], and normalize to the tau = -1
pre-period. Flat leads (tau < 0 near zero) are the
parallel-trends evidence DiD just assumes; nothing else in the
registry produces a dynamic treatment path.

Setup (house conventions): treatment = the user's FIRST signup event
(staggered adoption — users treat in different weeks); outcome =
per-(user, week) value cents. Weeks are epoch-based integer indices
(floor-div of epoch days by 7 — no session-timezone ambiguity).
For each treated user the 7 relative weeks in [-3, 3] are enumerated
from the bounded tau spine and left-joined against the user's weekly
outcomes (absent weeks are true zeros — the user existed, spent
nothing), so every (user, tau) cell is exact.

Determinism: cents sums BIGINT; per-tau means in floor-div
micro-cents over the treated-user count; the tau = -1 baseline is
pinned via an unpartitioned window over the 7-row tau frame and the
event-study coefficient is an exact integer difference of
micro-cent means.

Scale shape: events -> per-user first-signup aggregate (combinable)
-> 7x bounded tau explode on the USER frame -> equi-join back to the
(user, week) outcome aggregate (both shuffles on user keys) -> 7-row
tau aggregate. At 100 TB both heavy stages are user-keyed combinable
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

_TAU = 3


def event_study_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_event_study (scaling-probe entry)."""
    base = ev.select(
        "user_id",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7"
            " AS INT)"
        ).alias("wk"),
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    uw = base.groupBy("user_id", "wk").agg(
        F.sum("cents").cast("bigint").alias("v")
    )
    treated = base.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("wk").cast("int").alias("wk0"))
    cells = treated.select(
        "user_id",
        "wk0",
        F.explode(F.expr(f"sequence(-{_TAU}, {_TAU})")).alias("tau"),
    ).select(
        "user_id",
        F.col("tau").cast("int").alias("tau"),
        (F.col("wk0") + F.col("tau")).cast("int").alias("wk"),
    )
    filled = cells.join(uw, ["user_id", "wk"], "left").select(
        "tau", F.coalesce("v", F.lit(0)).cast("bigint").alias("v")
    )
    t = filled.groupBy("tau").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("v").cast("bigint").alias("s"),
    )
    w = t.select(
        "tau",
        "n_users",
        F.expr("CAST((1000000 * s) div n_users AS BIGINT)").alias(
            "mean_micro"
        ),
    ).select(
        "*",
        F.expr(
            "CAST(max(CASE WHEN tau = -1 THEN mean_micro END) OVER ()"
            " AS BIGINT)"
        ).alias("base_micro"),
    )
    return w.select(
        "tau",
        "n_users",
        "mean_micro",
        F.expr("CAST(mean_micro - base_micro AS BIGINT)").alias(
            "coef_micro"
        ),
    ).orderBy("tau")


@query(
    "events_event_study",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  // 7 AS INTEGER) AS wk,
             event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    uw AS (
      SELECT user_id, wk, CAST(sum(cents) AS BIGINT) AS v
      FROM base GROUP BY 1, 2
    ),
    treated AS (
      SELECT user_id, CAST(min(wk) AS INTEGER) AS wk0
      FROM base WHERE event_type = 'signup' GROUP BY 1
    ),
    cells AS (
      SELECT user_id, CAST(tau AS INTEGER) AS tau,
             CAST(wk0 + tau AS INTEGER) AS wk
      FROM treated CROSS JOIN
        (SELECT unnest(generate_series(-{_TAU}, {_TAU})) AS tau)
    ),
    filled AS (
      SELECT tau, CAST(coalesce(v, 0) AS BIGINT) AS v
      FROM cells LEFT JOIN uw USING (user_id, wk)
    ),
    t AS (
      SELECT tau, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(v) AS BIGINT) AS s
      FROM filled GROUP BY tau
    ),
    w AS (
      SELECT tau, n_users,
             CAST((1000000 * s) // n_users AS BIGINT) AS mean_micro
      FROM t
    )
    SELECT tau, n_users, mean_micro,
           CAST(mean_micro - max(CASE WHEN tau = -1 THEN mean_micro END)
                OVER () AS BIGINT) AS coef_micro
    FROM w ORDER BY tau
    """,
)
def events_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study path around each user's first signup week: per
    relative week tau in [-3, 3], treated-user count, exact micro-cent
    mean weekly value, and the coefficient normalized to tau = -1."""
    return event_study_frame(table(spark, sf_dir, "events"))
