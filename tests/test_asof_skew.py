"""Unit tests for as-of join, sessionization, and salted join with
planted edge cases (no right match, exact-time tie, right-tie on time,
session boundary exactly at the gap)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.ops.asof import asof_join, session_stats, sessionize
from etl_neotel_sql_automation_spark.ops.skew import salted_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),   # after r2 -> picks r2
            (2, "u1", _ts("2024-01-01 08:00:00")),   # exactly at r1 time -> includes r1
            (3, "u1", _ts("2024-01-01 07:00:00")),   # before all -> null
            (4, "u2", _ts("2024-01-01 10:00:00")),   # tie on right time -> max key
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 08:00:00"), 101),
            ("u1", _ts("2024-01-01 09:00:00"), 102),
            ("u2", _ts("2024-01-01 09:00:00"), 201),
            ("u2", _ts("2024-01-01 09:00:00"), 202),  # same-time tie
        ],
        "k string, t timestamp, okey long",
    )
    out = asof_join(
        left, right,
        left_key="user_id", right_key="k",
        left_time="ts", right_time="t",
        right_vals=["okey"],
    )
    got = {r.event_id: r.okey for r in out.collect()}
    assert got == {1: 102, 2: 101, 3: None, 4: 202}


def test_asof_join_forward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 08:30:00")),   # before r2 -> picks r2 (09:00)
            (2, "u1", _ts("2024-01-01 08:00:00")),   # exactly at r1 time -> includes r1
            (3, "u1", _ts("2024-01-01 10:00:00")),   # after all -> null
            (4, "u2", _ts("2024-01-01 08:00:00")),   # tie on right time -> max key
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 08:00:00"), 101),
            ("u1", _ts("2024-01-01 09:00:00"), 102),
            ("u2", _ts("2024-01-01 09:00:00"), 201),
            ("u2", _ts("2024-01-01 09:00:00"), 202),  # same-time tie
        ],
        "k string, t timestamp, okey long",
    )
    out = asof_join(
        left, right,
        left_key="user_id", right_key="k",
        left_time="ts", right_time="t",
        right_vals=["okey"],
        direction="forward",
    )
    got = {r.event_id: r.okey for r in out.collect()}
    assert got == {1: 102, 2: 101, 3: None, 4: 202}


def test_asof_join_null_right_vals_stay_row_consistent(spark):
    """When a right-side value column contains nulls, ALL attached
    columns must still come from the SAME right row (the single-struct
    carry; independent per-column last(ignorenulls) would resurrect an
    older row's value for the null column)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 08:00:00"), 101, "old"),
            ("u1", _ts("2024-01-01 09:00:00"), 102, None),  # latest: tag null
        ],
        "k string, t timestamp, okey long, tag string",
    )
    out = asof_join(
        left, right,
        left_key="user_id", right_key="k",
        left_time="ts", right_time="t",
        right_vals=["okey", "tag"],
    ).collect()[0]
    # latest right row wins wholesale: okey=102 AND tag=None —
    # not (okey=102, tag="old") column mixing
    assert (out.okey, out.tag) == (102, None)


def test_sessionize_gap_boundary(spark):
    rows = [
        (1, 7, _ts("2024-01-01 10:00:00")),
        (2, 7, _ts("2024-01-01 10:29:00")),  # 29 min gap -> same session
        (3, 7, _ts("2024-01-01 11:00:00")),  # 31 min gap -> new session
        (4, 7, _ts("2024-01-01 11:30:00")),  # exactly 30 min -> same (not >)
        (5, 8, _ts("2024-01-01 10:00:00")),  # other user -> own session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    s = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert s == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    stats = {(r.user_id, r.session_id): (r.n_events, r.duration_us)
             for r in session_stats(df).collect()}
    assert stats[(7, 1)] == (2, 29 * 60 * 1_000_000)
    assert stats[(7, 2)] == (2, 30 * 60 * 1_000_000)
    assert stats[(8, 1)] == (1, 0)


def test_salted_join_equals_plain_join(spark):
    # skewed big side: one hot key dominating
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(10)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k long, name string")
    plain = big.join(small, "k").groupBy("name").agg(F.count("*").alias("n"))
    salted = salted_join(big, small, key="k", n_salt=4).groupBy("name").agg(
        F.count("*").alias("n")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
    # the salt column must not leak into the output
    assert "__salt" not in salted_join(big, small, key="k").columns


def test_salted_join_spreads_partitions(spark):
    """The hot key must land in multiple shuffle partitions after
    salting — that's the entire point."""
    big = spark.createDataFrame([(1, i) for i in range(1000)], "k long, payload long")
    small = spark.createDataFrame([(1, "hot")], "k long, name string")
    out = salted_join(big, small, key="k", n_salt=8)
    # count distinct salts actually used pre-drop by recomputing
    salts = (
        big.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast("int"),
        )
        .select("__salt").distinct().count()
    )
    assert salts > 1
    assert out.count() == 1000


def test_asof_join_directions_randomized_vs_bruteforce(spark):
    """30 random scenarios per direction against a pure-Python brute
    force: for every left row the attached value must be the
    latest-right<=t (backward) / earliest-right>=t (forward), with the
    greatest right_vals tuple winning time ties in both directions."""
    import random

    rnd = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    lrows, rrows = [], []
    eid = 0
    for _ in range(30):
        key = f"u{rnd.randrange(8)}"
        for _ in range(rnd.randrange(1, 4)):
            eid += 1
            lrows.append((eid, key, base + dt.timedelta(minutes=rnd.randrange(60))))
        for _ in range(rnd.randrange(0, 4)):
            rrows.append((key, base + dt.timedelta(minutes=rnd.randrange(60)),
                          rnd.randrange(1000)))
    left = spark.createDataFrame(lrows, "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "k string, t timestamp, okey long")

    for direction in ("backward", "forward"):
        out = asof_join(
            left, right,
            left_key="user_id", right_key="k",
            left_time="ts", right_time="t",
            right_vals=["okey"], direction=direction,
        )
        got = {r.event_id: r.okey for r in out.collect()}
        for leid, lkey, lts in lrows:
            if direction == "backward":
                cand = [(t, ok) for (k, t, ok) in rrows if k == lkey and t <= lts]
                best = max(cand)[1] if cand else None
            else:
                cand = [(-(t.timestamp()), ok) for (k, t, ok) in rrows
                        if k == lkey and t >= lts]
                best = max(cand)[1] if cand else None
            assert got[leid] == best, (direction, leid, lkey, lts)
