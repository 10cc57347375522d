"""Fixture test for the wave-53 (round 8) lagged cross-correlation —
nation Y's daily revenue is nation X's shifted one day forward, so the
lag-1 correlation over the aligned pairs must be exactly 1.0, and
every other lag is cross-checked against numpy on the same
zero-filled day grid.
"""

from __future__ import annotations

import datetime

import numpy as np


def test_shifted_series_peaks_at_lag_one(spark):
    from etl_neotel_sql_automation_spark.workload.wave53 import (
        cross_corr_frame,
    )

    base = datetime.date(2024, 1, 1)
    vals = [100, 300, 200, 500, 400, 250]  # dollars, per-day, nation X
    orders_rows = []
    ok = 0
    for t, v in enumerate(vals):
        orders_rows.append((ok, 1, base + datetime.timedelta(days=t), float(v)))
        ok += 1
        # nation Y: same value one day LATER -> y_{t+1} = x_t
        orders_rows.append(
            (ok, 2, base + datetime.timedelta(days=t + 1), float(v))
        )
        ok += 1
    orders = spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, 10), (2, 20)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(10, "NATION_1"), (20, "NATION_2")],
        "n_nationkey long, n_name string",
    )
    got = {r["lag"]: r for r in cross_corr_frame(orders, customer, nation).collect()}
    # grid spans 7 days (day 0..6): lag 7 has no aligned pair -> no row
    assert sorted(got) == list(range(7))
    # zero-filled edges
    x = np.array([100, 300, 200, 500, 400, 250, 0], dtype=float) * 100
    y = np.array([0, 100, 300, 200, 500, 400, 250], dtype=float) * 100
    for lag in range(7):
        n = 7 - lag
        assert got[lag]["n_days"] == n
        if n < 2:
            continue
        xs, ys = x[:n], y[lag:]
        expect = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(got[lag]["corr_xy"] - expect) < 1e-6, (lag, expect)
    assert got[1]["corr_xy"] == 1.0
