"""Fixture tests for the wave-10 (round 6) workloads — semantics the
oracle differential cannot pin: the packed-key tiebreak that makes
streaming first/last exact, TWAP's step-interpolation weighting, and
the first-occurrence trick behind running distinct counts.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# The packed order key (offset_us * 2^24 + event_id): two ticks in the
# SAME microsecond must resolve by event_id — min_by/max_by over the
# packed key behave exactly like the batch row_number tiebreak.
# ---------------------------------------------------------------------------


def test_ohlc_packed_key_tiebreak(spark):
    rows = [
        # (ts_us_offset, event_id, cents) — first two share a timestamp
        (1_000, 9, 500),
        (1_000, 2, 300),  # same us, smaller id -> the true open
        (2_000, 5, 900),
        (3_000, 1, 100),  # latest ts -> the true close
    ]
    df = spark.createDataFrame(rows, "off long, event_id long, cents long")
    packed = df.select(
        (F.col("off") * 16777216 + F.col("event_id")).alias("k"), "cents"
    )
    [r] = packed.agg(
        F.expr("min_by(cents, k)").alias("open"),
        F.expr("max_by(cents, k)").alias("close"),
    ).collect()
    assert r["open"] == 300
    assert r["close"] == 100


def test_streaming_ohlc_matches_batch_formula(spark):
    """The streaming bars must equal a batch computation of the same
    packed-key formula — catches watermark/window-emission bugs the
    SQL differential (also batch on the oracle side) would miss only
    if Spark's own batch/streaming semantics diverged."""
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave10 import streaming_hourly_ohlc

    got = {
        r["hour_start"]: (r["open_cents"], r["close_cents"], r["n_events"])
        for r in streaming_hourly_ohlc(spark, SF).collect()
    }
    ev = table(spark, SF, "events")
    batch = (
        ev.select(
            F.date_trunc("hour", "ts").alias("h"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            (
                (F.unix_micros("ts") - F.unix_micros(F.date_trunc("hour", "ts")))
                * F.lit(16777216)
                + F.col("event_id")
            ).alias("k"),
        )
        .groupBy("h")
        .agg(
            F.expr("min_by(cents, k)").alias("o"),
            F.expr("max_by(cents, k)").alias("c"),
            F.count("*").alias("n"),
        )
    )
    want = {r["h"]: (r["o"], r["c"], r["n"]) for r in batch.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# TWAP: a value that holds for 3/4 of the day dominates accordingly —
# the plain mean would say 150, the time-weighted answer is 125.
# ---------------------------------------------------------------------------


def test_twap_weights_by_duration(spark):
    rows = [
        ("g", "2024-01-01 00:00:00", 1, 100),  # holds 18 h (3/4 day)
        ("g", "2024-01-01 18:00:00", 2, 200),  # holds 6 h  (1/4 day)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, event_id long, cents long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = df.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
    nxt = F.lead("ts").over(
        W.partitionBy("event_type", "day").orderBy("ts", "event_id")
    )
    s = r.select(
        "cents",
        (
            F.unix_micros(F.coalesce(nxt, F.date_add("day", 1).cast("timestamp")))
            - F.unix_micros("ts")
        ).alias("dur_us"),
    )
    [row] = s.agg(
        F.expr("CAST(sum(cents * dur_us) div sum(dur_us) AS BIGINT)").alias("twap")
    ).collect()
    assert row["twap"] == 125  # 100 * 3/4 + 200 * 1/4


# ---------------------------------------------------------------------------
# Running distinct: a user active on three days is counted once, on
# their first day.
# ---------------------------------------------------------------------------


def test_running_distinct_counts_first_occurrence_only(spark):
    rows = [
        ("click", 1, "2024-01-01 10:00:00", 1),
        ("click", 1, "2024-01-02 10:00:00", 2),  # repeat user, day 2
        ("click", 1, "2024-01-03 10:00:00", 3),  # repeat user, day 3
        ("click", 2, "2024-01-02 11:00:00", 4),  # new user, day 2
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    f = df.select(
        "event_type",
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.row_number()
        .over(W.partitionBy("event_type", "user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    d = (
        f.groupBy("event_type", "day")
        .agg(F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("new_users"))
        .withColumn(
            "cum",
            F.sum("new_users").over(
                W.partitionBy("event_type")
                .orderBy("day")
                .rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )
    got = {str(r["day"]): (r["new_users"], r["cum"]) for r in d.collect()}
    assert got == {
        "2024-01-01": (1, 1),  # user 1 first seen
        "2024-01-02": (1, 2),  # user 2 new; user 1 not recounted
        "2024-01-03": (0, 2),  # nothing new
    }
