"""Fixture tests for the wave-57 (round 8) log-log price elasticity —
a constructed power-law brand cross-checked against a numpy reference
applying the IDENTICAL micro-nat quantization, and a zero-variance
brand exercising the exact-integer degenerate guard.
"""

from __future__ import annotations

import math


def _li(spark, rows):
    # rows: (brand, qty, unit_price) -> lineitem-shaped with p_brand
    return spark.createDataFrame(
        [(b, float(q), float(q * up)) for b, q, up in rows],
        "p_brand string, l_quantity double, l_extendedprice double",
    )


def test_power_law_brand_matches_numpy_on_quantized_logs(spark):
    from etl_neotel_sql_automation_spark.workload.wave57 import (
        elasticity_frame,
    )

    # demand q = 1000 * p^-2 at prices 5/8/10/20/25, plus noise brand
    rows = []
    for p in (5, 8, 10, 20, 25):
        q = 1000.0 * p ** -2
        rows.append(("Brand#A", q, p))
    for q, p in ((3, 7.5), (9, 2.0), (4, 11.0), (12, 1.25)):
        rows.append(("Brand#B", q, p))
    got = {
        r["p_brand"]: r
        for r in elasticity_frame(_li(spark, rows)).collect()
    }
    for brand in ("Brand#A", "Brand#B"):
        sub = [(q, p) for b, q, p in rows if b == brand]
        # plain Python ints: the moment products (~1e26) overflow int64
        x = [round(math.log(p) * 1e6) for _, p in sub]
        y = [round(math.log(q) * 1e6) for q, _ in sub]
        n = len(sub)
        sx, sy = sum(x), sum(y)
        det = n * sum(v * v for v in x) - sx * sx
        cov = n * sum(a * b for a, b in zip(x, y)) - sx * sy
        dey = n * sum(v * v for v in y) - sy * sy
        slope = float(cov) / float(det)
        assert got[brand]["elasticity"] == round(slope, 6)
        assert got[brand]["intercept_ln"] == round(
            (sy - slope * sx) / (n * 1e6), 6
        )
        assert got[brand]["r_squared"] == round(
            float(cov) * float(cov) / (float(det) * float(dey)), 6
        )
    # the power-law brand is an (almost exactly) -2 elasticity
    assert abs(got["Brand#A"]["elasticity"] + 2.0) < 1e-4
    assert got["Brand#A"]["r_squared"] > 0.999999


def test_zero_price_variance_brand_yields_nulls(spark):
    from etl_neotel_sql_automation_spark.workload.wave57 import (
        elasticity_frame,
    )

    rows = [("Brand#C", q, 10.0) for q in (1, 2, 3)]
    [r] = elasticity_frame(_li(spark, rows)).collect()
    assert r["n"] == 3
    assert r["elasticity"] is None
    assert r["intercept_ln"] is None
    assert r["r_squared"] is None
