"""Fixture tests for the wave-52 (round 8) closed-form multiple OLS —
an exact-fit plane recovered to the coefficient (R^2 = 1), and a noisy
corpus cross-checked against numpy's independent lstsq solver.
"""

from __future__ import annotations

import numpy as np


def _li(spark, rows):
    # (qty, disc, extprice) in table units: dollars, fraction
    return spark.createDataFrame(
        [(float(q), float(d), float(p)) for q, d, p in rows],
        "l_quantity double, l_discount double, l_extendedprice double",
    )


def test_exact_plane_recovered(spark):
    from etl_neotel_sql_automation_spark.workload.wave52 import ols_frame

    # y_cents = 700 + 3*x1 + 5*x2_bp exactly, on a non-degenerate grid
    rows = []
    for q in (1, 2, 5, 10):
        for d_bp in (0, 100, 500, 900):
            y_cents = 700 + 3 * q + 5 * d_bp
            rows.append((q, d_bp / 10000.0, y_cents / 100.0))
    [r] = ols_frame(_li(spark, rows)).collect()
    assert r["n"] == 16
    assert r["b_qty"] == 3.0
    assert r["b_disc_bp"] == 5.0
    assert r["b_intercept"] == 700.0
    assert r["r_squared"] == 1.0


def test_noisy_fit_matches_numpy_lstsq(spark):
    from etl_neotel_sql_automation_spark.workload.wave52 import ols_frame

    rng_rows = [
        (3, 0.01, 120.40), (7, 0.05, 260.13), (12, 0.00, 410.77),
        (1, 0.09, 55.02), (25, 0.03, 810.50), (40, 0.07, 1310.99),
        (18, 0.02, 605.25), (9, 0.08, 300.01), (30, 0.04, 1005.10),
        (5, 0.06, 180.66),
    ]
    [r] = ols_frame(_li(spark, rng_rows)).collect()
    x1 = np.array([q for q, _, _ in rng_rows], dtype=float)
    x2 = np.array([round(d * 10000) for _, d, _ in rng_rows], dtype=float)
    y = np.array([round(p * 100) for _, _, p in rng_rows], dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    yhat = X @ beta
    ss_res = float(((y - yhat) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert r["b_intercept"] == round(float(beta[0]), 6)
    assert r["b_qty"] == round(float(beta[1]), 6)
    assert r["b_disc_bp"] == round(float(beta[2]), 6)
    # r_squared is round(6)-quantized in the frame; numpy's value is not
    assert abs(r["r_squared"] - (1 - ss_res / ss_tot)) < 1e-6
