"""Fixture test for the wave-55 (round 8) PACF — a 12-day order-count
series checked against an independent numpy Yule-Walker solve (the
Durbin-Levinson recursion IS the recursive Yule-Walker solution, so
pacf_k must equal the last coefficient of the order-k Toeplitz solve
on the same biased sample ACF).
"""

from __future__ import annotations

import datetime

import numpy as np


def test_pacf_matches_numpy_yule_walker(spark):
    from etl_neotel_sql_automation_spark.workload.wave55 import pacf_frame

    base = datetime.date(2024, 3, 1)
    counts = [5, 3, 4, 6, 2, 7, 4, 5, 3, 6, 8, 2]
    rows = []
    ok = 0
    for t, c in enumerate(counts):
        for _ in range(c):
            rows.append((ok, base + datetime.timedelta(days=t)))
            ok += 1
    orders = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date")
    got = {r["lag"]: r for r in pacf_frame(orders).collect()}
    assert sorted(got) == [1, 2, 3, 4]

    # independent reference: biased sample ACF then Toeplitz YW solves
    x = np.array(counts, dtype=float)
    b = len(x) * x - x.sum()  # the exact-centering transform (scale-free)
    den = float(b @ b)
    r = [float(b[:-k] @ b[k:]) / den for k in range(1, 5)]
    for k in range(1, 5):
        assert got[k]["acf"] == round(r[k - 1], 6)
        rr = np.array([1.0] + r)  # rho_0..rho_4
        T = np.array([[rr[abs(i - j)] for j in range(k)] for i in range(k)])
        phi = np.linalg.solve(T, rr[1 : k + 1])
        assert abs(got[k]["pacf"] - phi[-1]) < 1e-6, (k, phi[-1])
