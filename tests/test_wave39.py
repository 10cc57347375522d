"""Fixture tests for the wave-39 (round 7) workloads — the SES folds
replayed by hand with the winner selection forced each way, and the
generalization ladder on a population whose k profile is constructed.
"""

from __future__ import annotations

import datetime


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _daily(spark, tmp_path, counts):
    rows = []
    k = 0
    for day, cnt in enumerate(counts, start=2):
        for _ in range(cnt):
            rows.append((k, 1, datetime.datetime(1996, 1, day)))
            k += 1
    return _orders(spark, tmp_path, rows)


def test_ses_sweep_hand_replayed(spark, tmp_path):
    """y = [8, 12]: per alpha the level is 8e6 + 4e6//d and every SAE
    is |12e6 - 8e6| = 4e6 (error measured before the update), so the
    tie breaks to the LARGEST alpha."""
    from etl_neotel_sql_automation_spark.workload.wave39 import (
        timeseries_ses_sweep,
    )

    rows = {
        r["alpha_milli"]: r
        for r in timeseries_ses_sweep(
            spark, _daily(spark, tmp_path, [8, 12])
        ).collect()
    }
    assert rows[500]["level_micro"] == 8_000_000 + 4_000_000 // 2
    assert rows[250]["level_micro"] == 8_000_000 + 4_000_000 // 4
    assert rows[125]["level_micro"] == 8_000_000 + 4_000_000 // 8
    for a in (500, 250, 125):
        assert rows[a]["mae_micro"] == 4_000_000
    assert rows[500]["is_best"] == 1
    assert rows[250]["is_best"] == 0 and rows[125]["is_best"] == 0


def test_ses_sweep_slow_alpha_wins_on_noise(spark, tmp_path):
    """An alternating series (8, 12, 8, 12, ...) punishes fast
    adaptation: the smallest alpha must carry the lowest MAE and win."""
    from etl_neotel_sql_automation_spark.workload.wave39 import (
        timeseries_ses_sweep,
    )

    rows = {
        r["alpha_milli"]: r
        for r in timeseries_ses_sweep(
            spark, _daily(spark, tmp_path, [8, 12] * 10)
        ).collect()
    }
    assert rows[125]["mae_micro"] < rows[500]["mae_micro"]
    assert rows[125]["is_best"] == 1
    assert rows[500]["is_best"] == 0


def test_generalization_ladder_constructed_k(spark, tmp_path):
    """100 customers x 1 order each on the same day: level 0 has
    k = 1 everywhere (all rows suppressed at k=5); level 3 pools
    custkey//1000 = 0 into ONE group of 100 (nothing suppressed,
    min_k = 100)."""
    from etl_neotel_sql_automation_spark.workload.wave39 import (
        privacy_generalization_ladder,
    )

    d = datetime.datetime(1996, 3, 5)
    rows = [(i, i, d) for i in range(100)]
    res = {
        r["level"]: r
        for r in privacy_generalization_ladder(
            spark, _orders(spark, tmp_path, rows)
        ).collect()
    }
    assert res[0]["n_groups"] == 100 and res[0]["min_k"] == 1
    assert res[0]["suppressed_ppm"] == 1_000_000
    assert res[3]["n_groups"] == 1 and res[3]["min_k"] == 100
    assert res[3]["suppressed_ppm"] == 0
    assert res[3]["avg_group_milli"] == 100_000
    # level 1: custkey//10 -> 10 groups of 10, none below 5
    assert res[1]["n_groups"] == 10 and res[1]["min_k"] == 10
    assert res[1]["suppressed_ppm"] == 0
