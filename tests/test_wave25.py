"""Fixture tests for the wave-25 (round 6) workloads — semantics the
oracle differential cannot pin: NRR's three canonical cases on one
hand-built cohort (full retention = 1e6, expansion > 1e6, total churn
= 0), scorecard extremes (a zero-return revenue/reach leader scores
exactly 1e6; score is monotone in returns), and stickiness bounds
(everyone-active-every-day reads exactly 1e6; interior-window rule
drops the first 27 days).
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_nrr_three_canonical_cases(spark, tmp_path):
    """1995 cohort: $100 base, $100 next year -> NRR exactly 1e6.
    1996 cohort: $100 base, $250 next -> 2.5e6 (expansion).
    1997 cohort: $100 base, nothing after -> 0 (churn)."""
    from etl_neotel_sql_automation_spark.workload.wave25 import (
        orders_nrr_cohorts,
    )

    rows = [
        (1, 1, 100.0, datetime.datetime(1995, 3, 1), "x"),
        (2, 1, 100.0, datetime.datetime(1996, 3, 1), "x"),
        (3, 2, 100.0, datetime.datetime(1996, 5, 1), "x"),
        (4, 2, 250.0, datetime.datetime(1997, 5, 1), "x"),
        (5, 3, 100.0, datetime.datetime(1997, 7, 1), "x"),
    ]
    out = {r["cohort_year"]: r for r in
           orders_nrr_cohorts(spark, _orders(spark, tmp_path, rows)).collect()}
    assert out[1995]["nrr_ppm"] == 1_000_000
    assert out[1996]["nrr_ppm"] == 2_500_000
    assert out[1997]["nrr_ppm"] == 0
    # cust 1's 1996 order counts toward the 1995 cohort's NEXT year,
    # not the 1996 cohort's base
    assert out[1996]["base_cents"] == 10_000


def _lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_extendedprice double,"
        " l_returnflag string",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_scorecard_perfect_supplier(spark, tmp_path):
    """A supplier with zero returns, the max revenue AND the max order
    reach scores exactly 1e6 ppm; a peer with half the revenue, half
    the reach and 50% returns scores 0.4*0.5 + 0.4*0.5 + 0.2*0.5 =
    500000 ppm."""
    from etl_neotel_sql_automation_spark.workload.wave25 import (
        supplier_scorecard,
    )

    rows = []
    # supplier 1: 4 lines in 4 orders, $100 each, no returns
    for i in range(4):
        rows.append((100 + i, 1, 100.0, "N"))
    # supplier 2: 2 lines in 2 orders, $100 each, 1 returned
    rows.append((200, 2, 100.0, "R"))
    rows.append((201, 2, 100.0, "N"))
    out = {r["l_suppkey"]: r for r in
           supplier_scorecard(spark, _lineitem(spark, tmp_path, rows)).collect()}
    assert out[1]["composite_ppm"] == 1_000_000
    assert out[1]["return_ppm"] == 0
    assert out[2]["composite_ppm"] == 500_000


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_stickiness_everyone_every_day(spark, tmp_path):
    """3 users active every one of 30 days: DAU = MAU = 3 on interior
    days -> stickiness exactly 1e6, and only days 28..30 are emitted
    (the 27-day warmup is dropped)."""
    from etl_neotel_sql_automation_spark.workload.wave25 import (
        events_stickiness,
    )

    rows = []
    eid = 0
    for d in range(30):
        for uid in (1, 2, 3):
            rows.append(
                (eid := eid + 1,
                 datetime.datetime(2024, 1, 1 + d, 12, 0, 0), uid, "view",
                 1.0)
            )
    out = events_stickiness(spark, _events(spark, tmp_path, rows)).collect()
    assert len(out) == 3  # days 28, 29, 30 of January
    assert all(r["dau"] == 3 and r["mau"] == 3 for r in out)
    assert all(r["stickiness_ppm"] == 1_000_000 for r in out)


def test_stickiness_churned_user_dilutes(spark, tmp_path):
    """User 9 is active only on day 1; on day 28 they still count in
    the trailing MAU but not DAU -> stickiness = 2/3 exactly."""
    from etl_neotel_sql_automation_spark.workload.wave25 import (
        events_stickiness,
    )

    rows = []
    eid = 0
    rows.append((eid := eid + 1, datetime.datetime(2024, 1, 1, 9, 0, 0),
                 9, "view", 1.0))
    for d in range(28):
        for uid in (1, 2):
            rows.append(
                (eid := eid + 1,
                 datetime.datetime(2024, 1, 1 + d, 12, 0, 0), uid, "view",
                 1.0)
            )
    out = events_stickiness(spark, _events(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["dau"] == 2 and r["mau"] == 3
    assert r["stickiness_ppm"] == 666_666
