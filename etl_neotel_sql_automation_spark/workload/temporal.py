"""Temporal-semantics workload: native session windows and the
try_* / interval scalar surface.

``events_session_window`` is deliberately a SEMANTIC cross-engine
check: Spark's built-in ``session_window`` aggregation (the same
operator Structured Streaming uses for stateful session aggregation)
is verified against a from-first-principles gaps-and-islands SQL
formulation in DuckDB. If Spark's merge rule (new session iff
gap >= 30 min, window end = last event + gap) drifted from the
documented contract, the value hash would catch it.

Scale notes: session_window is one shuffle on the grouping key with
streaming-capable state merging — at 100 TB it replaces the two-window
(lag + running-sum) formulation with a single agg whose state is one
interval per open session. The try_*/interval query is a pure
projection — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query, table


@query(
    "events_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts)                        AS session_start,
           max(ts) + INTERVAL 30 MINUTE   AS session_end,
           count(*)                       AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` aggregation (30-minute gap): events of
    one user merge while each gap is under 30 minutes; the window ends
    at last event + gap. The oracle rebuilds the same sessions with
    gaps-and-islands SQL (new session iff gap >= 30 min — Spark merges
    an event only while it lands strictly inside the open window), so
    the two formulations must agree on every session boundary, start,
    end, and size. Complements ``sessionize_events`` (explicit
    lag+running-sum build of the same concept) and
    ``streaming_stateful_sessionize`` (applyInPandasWithState)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "scalar_try_interval",
    oracle="""
    SELECT event_id,
           event_id / NULLIF(user_id % 5, 0)        AS safe_ratio,
           TRY_CAST(event_type AS INTEGER)          AS type_as_int,
           ts + INTERVAL 90 MINUTE                  AS ts_plus_90m,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')
                                                    AS days_to_feb
    FROM events
    WHERE event_id % 11 = 0
    """,
)
def scalar_try_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_*-family error-safe scalars (the engine-wide ANSI-safe
    coercion policy, SURVEY §2.8, exercised as data ops) plus interval
    arithmetic: division that nulls instead of failing on zero
    denominators, casts that null instead of raising, timestamp +
    interval, month truncation, and day difference."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    return ev.select(
        "event_id",
        F.try_divide(F.col("event_id"), F.col("user_id") % 5).alias("safe_ratio"),
        F.col("event_type").try_cast("int").alias("type_as_int"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        F.date_trunc("month", F.col("ts")).alias("month_start"),
        F.datediff(
            F.lit("2024-02-01").cast("date"), F.col("ts").cast("date")
        ).alias("days_to_feb"),
    )


@query(
    "window_rolling_30d",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rolling_30d_cents
    FROM orders
    WHERE o_custkey % 17 = 0
    """,
)
def window_rolling_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day spend per customer: a time-interval RANGE frame
    (peers by time distance, complementing ``window_range_frame``'s
    value-distance frame). Both engines order by epoch seconds and
    use a numeric 30-day range, so frame boundaries are identical;
    the sum rides on exact cent integers. One shuffle on the
    partition key; frame state streams through the per-key sort, so
    the window never materializes a customer's history."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 17 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.sum(cents).over(w).alias("rolling_30d_cents"),
        )
    )


@query(
    "streaming_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts)                        AS session_start,
           max(ts) + INTERVAL 30 MINUTE   AS session_end,
           count(*)                       AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of ``events_session_window``: the same native
    session_window aggregation run through Structured Streaming's
    session-merge state machine (see streaming.landing.
    stream_session_windows) — its final result must equal the batch
    operator AND the independent gaps-and-islands SQL, closing the
    loop batch == streaming == first-principles."""
    from ..streaming.landing import stream_session_windows

    return stream_session_windows(spark, sf_dir)


@query(
    "events_anomaly_mad",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_start,
             count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    med AS (
      SELECT event_type, quantile_cont(n, 0.5) AS med FROM hourly
      GROUP BY event_type
    ),
    dev AS (
      SELECT h.event_type, h.hour_start, h.n, m.med,
             abs(h.n - m.med) AS adev
      FROM hourly h JOIN med m ON h.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
      GROUP BY event_type
    )
    SELECT d.event_type, d.hour_start, d.n,
           round(d.med, 4) AS med, round(m.mad, 4) AS mad,
           d.adev > 3 * m.mad AS is_anomaly
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on event-rate time series: hourly
    counts per event type flagged when the absolute deviation from the
    type's MEDIAN exceeds 3× the MEDIAN absolute deviation — the
    outlier rule that, unlike mean/stddev z-scores, is not dragged by
    the anomalies it is hunting (50% breakdown point). This is the
    pipeline-health monitor a streaming ingest runs over its own
    throughput. Shape: one hourly aggregate (map-side combinable),
    then two tiny per-type median reductions joined back — the
    hours×types frame is dimension-sized, so the medians never see raw
    events. Cross-engine: counts are integers, medians interpolate
    identical doubles (round-4 only on DISPLAY columns; the flag
    compares the raw doubles both engines computed identically)."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = hourly.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return dev.join(mad, "event_type").select(
        "event_type",
        "hour_start",
        "n",
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        (F.col("adev") > 3 * F.col("mad")).alias("is_anomaly"),
    )


@query(
    "events_top_paths",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
      FROM g
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '->' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, session_id
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path HAVING count(*) >= 5
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session PATH analysis: the most common event-type sequences per
    session (the funnel-discovery complement to the fixed-step funnel
    query — you don't know which paths matter until you count them).
    Sessions come from the proven 30-minute lag-gap sessionizer; the
    ordered path string is built engine-side as
    sort_array(collect_list(struct(ts, event_id, type))) -> concat so
    the order is total and deterministic (DuckDB mirrors with ordered
    string_agg). Rare paths (<5 sessions) are pruned BEFORE the tiny
    top-20 sort. Per-session state is one event list — bounded by the
    watermark/session length at streaming scale."""
    from ..ops.asof import sessionize

    ev = table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", "event_id", gap_minutes=30.0)
    paths = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                "->",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@query(
    "events_session_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN event_type = 'purchase' THEN 3600000000
                  ELSE 900000000 END AS gap_us
      FROM events
    ),
    m AS (
      SELECT user_id, us, gap_us,
             max(us + gap_us) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pe
      FROM e
    ),
    g AS (
      SELECT user_id, us, gap_us,
             CASE WHEN pe IS NULL OR us >= pe THEN 1 ELSE 0 END AS brk
      FROM m
    ),
    s AS (
      SELECT user_id, us, gap_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us + gap_us) AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows: the session timeout depends on the
    event (purchases hold a session open 1 hour, everything else 15
    minutes) via ``session_window(ts, CASE ...)`` — the
    per-event-type engagement model fixed-gap sessionization can't
    express (sessionize_events / events_session_window are the fixed
    twins; the operator is streaming-capable unchanged). The oracle
    derives the merge from first principles: an event joins the
    session iff it starts before the RUNNING MAX of preceding
    window-ends (equal-boundary events start a NEW session — windows
    are half-open), then islands aggregate. Spark's native merge was
    verified equal to this model before registration, so the query
    pins the built-in operator's exact semantics, not an
    approximation of them.

    Scale shape: one user-keyed shuffle; the native operator keeps
    one interval per open session, the oracle's running max is one
    window pass — both O(events) with bounded per-key state.
    """
    ev = table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "1 hour").otherwise("15 minutes")
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


@query(
    "streaming_session_dynamic",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN event_type = 'purchase' THEN 3600000000
                  ELSE 900000000 END AS gap_us
      FROM events
    ),
    m AS (
      SELECT user_id, us, gap_us,
             max(us + gap_us) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pe
      FROM e
    ),
    g AS (
      SELECT user_id, us, gap_us,
             CASE WHEN pe IS NULL OR us >= pe THEN 1 ELSE 0 END AS brk
      FROM m
    ),
    s AS (
      SELECT user_id, us, gap_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us + gap_us) AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of streaming.landing.stream_session_dynamic_gap
    (see that docstring): the dynamic-gap session state machine run as
    a REAL streaming query, checked against the same first-principles
    running-max oracle as the batch twin."""
    from ..streaming.landing import stream_session_dynamic_gap

    return stream_session_dynamic_gap(spark, sf_dir)
