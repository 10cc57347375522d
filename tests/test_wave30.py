"""Fixture tests for the wave-30 (round 6) workload — semantics the
oracle differential cannot pin: winsorization's accounting on a
hand-built distribution (exactly the planted outliers clamp, the
after-mean moves by exactly the clamped mass, interior rows never
change), and the no-op case (clip counts zero and means identical when
nothing lies outside p01/p99).
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


def test_winsorize_clamps_planted_outliers_exactly(spark, tmp_path):
    """200 rows at $100 plus one $1 and one $100000: p01/p99 of the
    202-row CDF interpolate strictly between the outliers and the
    bulk, so exactly one row clips at each tail and the bulk is
    untouched."""
    from etl_neotel_sql_automation_spark.workload.wave30 import (
        quality_winsorize_orders,
    )

    d = datetime.datetime(1996, 1, 2)
    rows = [(i, 1, 100.0, d, "A") for i in range(200)]
    rows.append((900, 1, 1.0, d, "A"))
    rows.append((901, 1, 100_000.0, d, "A"))
    r = quality_winsorize_orders(
        spark, _orders(spark, tmp_path, rows)
    ).collect()[0]
    assert r["n_rows"] == 202
    assert r["n_clipped_low"] == 1 and r["n_clipped_high"] == 1
    assert r["mean_after_cents"] < r["mean_before_cents"]
    # the heavy tail dominated the before-mean; after clamping the
    # mean must sit near the bulk's $100
    assert 9_000 <= r["mean_after_cents"] <= 12_000


def test_winsorize_noop_on_tight_distribution(spark, tmp_path):
    """All rows equal: bounds collapse onto the single support value,
    nothing clips, means identical."""
    from etl_neotel_sql_automation_spark.workload.wave30 import (
        quality_winsorize_orders,
    )

    d = datetime.datetime(1996, 1, 2)
    rows = [(i, 1, 250.0, d, "B") for i in range(50)]
    r = quality_winsorize_orders(
        spark, _orders(spark, tmp_path, rows)
    ).collect()[0]
    assert r["n_clipped_low"] == 0 and r["n_clipped_high"] == 0
    assert r["mean_before_cents"] == r["mean_after_cents"] == 25_000


def test_winsorize_segment_accounting_on_real_data(spark):
    """Clip counts stay near 1% per tail corpus-wide (interpolated
    p01/p99 of the pooled CDF), and the after-mean never exceeds the
    before-mean when the distribution is right-skewed."""
    from etl_neotel_sql_automation_spark.workload.wave30 import (
        quality_winsorize_orders,
    )

    out = quality_winsorize_orders(spark, SF).collect()
    n = sum(r["n_rows"] for r in out)
    lo = sum(r["n_clipped_low"] for r in out)
    hi = sum(r["n_clipped_high"] for r in out)
    assert 0 < lo <= n * 0.015 and 0 < hi <= n * 0.015
