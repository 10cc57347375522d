"""Fixture test for the wave-65 (round 8) within estimator — a
two-supplier Simpson's-style panel: identical within-supplier slope
(200 cents/unit), large between-supplier level differences aligned
with quantity, so the pooled slope is badly confounded while the
within slope recovers 200 exactly (the fixture's sums are chosen so
every per-cluster floor-div is exact)."""

from __future__ import annotations


def _li(spark, rows):
    return spark.createDataFrame(
        [(s, float(x), float(y) / 100.0) for s, x, y in rows],
        "l_suppkey long, l_quantity double, l_extendedprice double",
    )


def test_within_slope_removes_supplier_confound(spark):
    from etl_neotel_sql_automation_spark.workload.wave65 import within_frame

    rows = []
    # supplier 1: y_cents = 100000 + 200x at x = 1,2,3
    for x in (1, 2, 3):
        rows.append((1, x, 100000 + 200 * x))
    # supplier 2: y_cents = 900000 + 200x at x = 10,11,12
    for x in (10, 11, 12):
        rows.append((2, x, 900000 + 200 * x))
    [r] = within_frame(_li(spark, rows)).collect()
    assert r["n"] == 6 and r["g_suppliers"] == 2
    assert r["within_slope"] == 200.0
    assert r["within_r_squared"] == 1.0
    # pooled slope replay (python ints)
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    n = 6
    pxy = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    pxx = n * sum(a * a for a in xs) - sum(xs) ** 2
    assert r["pooled_slope"] == round(pxy / pxx, 6)
    # the confound inflates the pooled slope far above the true 200
    assert r["pooled_slope"] > 10 * 200
