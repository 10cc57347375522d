"""Fixture tests for the wave-21 (round 6) workloads — semantics the
oracle differential cannot pin: the duplicate detector counts each
pair once with the right gap and signal flags, the p-chart's limits
flag a planted out-of-control week (and nothing else) with LCL clamped
at zero, and the funnel-latency quartiles against a hand-computed
latency multiset including the interpolated case.
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


def test_duplicate_payments_pairs_and_signals(spark, tmp_path):
    """Customer 1: $100.00 on day 0, $100.00 on day 2 (exact dup,
    gap 2), $100.50 on day 3 (within-dollar of both, gap 3 and 1).
    Customer 2: one lone order — no pairs."""
    from etl_neotel_sql_automation_spark.workload.wave21 import (
        dq_duplicate_payments,
    )

    d0 = datetime.datetime(1996, 1, 10)

    def at(days):
        return d0 + datetime.timedelta(days=days)

    rows = [
        (1, 1, 100.00, at(0), "x"),
        (2, 1, 100.00, at(2), "x"),
        (3, 1, 100.50, at(3), "x"),
        (4, 2, 500.00, at(0), "x"),
    ]
    out = {r["gap_days"]: r for r in
           dq_duplicate_payments(spark, _orders(spark, tmp_path, rows)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_pairs"] == 1 and out[2]["n_exact_cents"] == 1
    assert out[1]["n_pairs"] == 1 and out[1]["n_exact_cents"] == 0
    assert out[1]["n_within_dollar"] == 1  # 100.00 vs 100.50
    assert out[3]["n_within_dollar"] == 1
    assert all(r["n_customers"] == 1 for r in out.values())


def _lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_returnflag string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_pchart_flags_planted_shift_only(spark, tmp_path):
    """19 weeks at 10% returns (100 items each), one week at 50%:
    only the planted week breaches its 3-sigma limit; LCL is clamped
    at 0 when p-bar is small."""
    from etl_neotel_sql_automation_spark.workload.wave21 import (
        quality_pchart_returns,
    )

    base = datetime.datetime(1996, 1, 1)  # a Monday
    rows = []
    lid = 0
    for wk in range(20):
        n_r = 50 if wk == 10 else 10
        for i in range(100):
            flag = "R" if i < n_r else "N"
            rows.append(
                (lid := lid + 1, flag, base + datetime.timedelta(days=7 * wk))
            )
    out = quality_pchart_returns(
        spark, _lineitem(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 20
    flagged = [r for r in out if r["out_of_control"] == 1]
    assert len(flagged) == 1
    assert flagged[0]["rate_ppm"] == 500_000
    assert all(r["lcl"] >= 0.0 for r in out)
    # pooled: (19*10 + 50) / 2000 = 12%
    assert out[0]["pbar_ppm"] == 120_000


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_latency_hand_computed_quartiles(spark, tmp_path):
    """Latencies {10, 20, 40, 80} minutes: percentile_cont gives
    p25 = 17.5, p50 = 30, p75 = 50 minutes (all interpolated)."""
    from etl_neotel_sql_automation_spark.workload.wave21 import (
        events_funnel_latency,
    )

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    rows = []
    eid = 0
    for uid, lat in [(1, 10), (2, 20), (3, 40), (4, 80)]:
        rows.append((eid := eid + 1, t0, uid, "signup", 1.0))
        rows.append(
            (eid := eid + 1, t0 + datetime.timedelta(minutes=lat), uid,
             "purchase", 200.0)
        )
    # a user who never converts and one who purchases before signup
    rows.append((eid := eid + 1, t0, 5, "signup", 1.0))
    rows.append((eid := eid + 1, t0 - datetime.timedelta(hours=1), 6,
                 "purchase", 9.0))
    rows.append((eid := eid + 1, t0, 6, "signup", 1.0))
    r = events_funnel_latency(spark, _events(spark, tmp_path, rows)).collect()[0]
    assert r["n_converted"] == 4
    assert r["p25_micromin"] == 17_500_000
    assert r["p50_micromin"] == 30_000_000
    assert r["p75_micromin"] == 50_000_000


def test_funnel_latency_single_converter(spark, tmp_path):
    """One converter: every quartile is that user's latency exactly
    (h = 0, no interpolation)."""
    from etl_neotel_sql_automation_spark.workload.wave21 import (
        events_funnel_latency,
    )

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, t0, 1, "signup", 1.0),
        (2, t0 + datetime.timedelta(minutes=42), 1, "purchase", 200.0),
    ]
    r = events_funnel_latency(spark, _events(spark, tmp_path, rows)).collect()[0]
    assert r["n_converted"] == 1
    assert (
        r["p25_micromin"] == r["p50_micromin"] == r["p75_micromin"]
        == 42_000_000
    )
