"""Fixture tests for the wave-22 (round 6) workloads — semantics the
oracle differential cannot pin: the seasonal anomaly gate stays quiet
on a pure weekly pattern (the raw-MAD false-positive a seasonal gate
exists to kill) and fires on a planted aseasonal spike; bag-semantics
multiplicity arithmetic on hand-built multisets; and share-of-parent
partition identities (children sum to their parent, parents to the
total).
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


def _weekly_series(bump_day=None, bump=0.0, days=56):
    """Trendless daily series with a +$50 Friday pattern; optionally
    plant an extra bump on one day."""
    base = datetime.date(1996, 1, 1)  # Monday
    rows = []
    for i in range(days):
        day = base + datetime.timedelta(days=i)
        v = 100.0 + (50.0 if day.weekday() == 4 else 0.0)
        if bump_day is not None and i == bump_day:
            v += bump
        rows.append(
            (i, 1, v, datetime.datetime(day.year, day.month, day.day), "x")
        )
    return rows


def test_seasonal_anomaly_quiet_on_pure_weekly_pattern(spark, tmp_path):
    """Every Friday +50% — a raw MAD gate would fire weekly; the
    seasonally-adjusted gate reports zero anomalies."""
    from etl_neotel_sql_automation_spark.workload.wave22 import (
        timeseries_seasonal_anomaly,
    )

    r = timeseries_seasonal_anomaly(
        spark, _orders(spark, tmp_path, _weekly_series())
    ).collect()[0]
    assert r["n_anomalies"] == 0
    assert r["worst_abs_dev_cents"] is None


def test_seasonal_anomaly_fires_on_aseasonal_spike(spark, tmp_path):
    """The same weekly series with one +$500 Tuesday: exactly that
    neighborhood fires (the spike leaks into its 7-day trend window,
    so the count is small but nonzero and the worst deviation is the
    spike day's)."""
    from etl_neotel_sql_automation_spark.workload.wave22 import (
        timeseries_seasonal_anomaly,
    )

    r = timeseries_seasonal_anomaly(
        spark,
        _orders(spark, tmp_path, _weekly_series(bump_day=29, bump=500.0)),
    ).collect()[0]
    assert r["n_anomalies"] >= 1
    assert r["worst_abs_dev_cents"] is not None
    # the spike day keeps ~6/7 of the bump after trend removal
    assert r["worst_abs_dev_cents"] > 30_000


def _pair_tables(spark, tmp_path, flags_per_cust):
    """flags_per_cust: {custkey: (n_R, n_A)} — one order per custkey,
    n lineitems per flag."""
    d = datetime.datetime(1996, 1, 2)
    orders, lines = [], []
    lid = 0
    for ck, (nr, na) in flags_per_cust.items():
        orders.append((ck * 10, ck, 1.0, d, "x"))
        for _ in range(nr):
            lines.append((ck * 10, (lid := lid + 1), "R"))
        for _ in range(na):
            lines.append((ck * 10, (lid := lid + 1), "A"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber long, l_returnflag string"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_bag_set_ops_multiplicity(spark, tmp_path):
    """cust 1: 3R/1A -> surplus 2, common 1; cust 2: 1R/1A -> surplus
    none, common 1; cust 3: 0R/2A -> neither."""
    from etl_neotel_sql_automation_spark.workload.wave22 import (
        set_except_all_returns,
        set_intersect_all_returns,
    )

    sf = _pair_tables(spark, tmp_path, {1: (3, 1), 2: (1, 1), 3: (0, 2)})
    surplus = {r["custkey"]: r["n_surplus"]
               for r in set_except_all_returns(spark, sf).collect()}
    common = {r["custkey"]: r["n_common"]
              for r in set_intersect_all_returns(spark, sf).collect()}
    assert surplus == {1: 2}
    assert common == {1: 1, 2: 1}


def test_share_of_parent_partition_identities(spark):
    """Brands partition their type's cents exactly; ppm shares sum to
    ~1e6 per parent (floor loss < #children); types partition the
    total."""
    from etl_neotel_sql_automation_spark.workload.wave22 import (
        part_share_of_parent,
    )

    out = part_share_of_parent(spark, SF).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["p_type"], []).append(r)
    total = sum({r["p_type"]: r["type_cents"] for r in out}.values())
    for t, rows in by_type.items():
        assert sum(r["brand_cents"] for r in rows) == rows[0]["type_cents"]
        share_sum = sum(r["share_of_type_ppm"] for r in rows)
        assert 1_000_000 - len(rows) <= share_sum <= 1_000_000
        assert all(r["type_share_ppm"] == (1_000_000 * rows[0]["type_cents"])
                   // total for r in rows)
