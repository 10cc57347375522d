"""Fixture tests for the wave-33 (round 7) Croston workload — the
recurrence replayed by hand on a tiny planted series (both engines
share the formula, so the differential can't catch a transcription
error in the update equations), plus the intermittency property that
motivates Croston over plain smoothing.
"""

from __future__ import annotations

import datetime


def _li(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "l_partkey long, l_shipdate timestamp, l_quantity double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _d(day):
    return datetime.datetime(1992, 1, day)


def test_croston_hand_replayed(spark, tmp_path):
    """Part 0 demands: day1 q=8, day4 q=16 (interval 3), day5 q=4
    (interval 1). Hand fold with S=1e6, alpha=1/4:
      seed  z=8e6,      p=1e6
      k=2   z=8e6+(16e6-8e6)//4=10e6,  p=1e6+(3e6-1e6)//4=1.5e6
      k=3   z=10e6+(4e6-10e6)//4=8.5e6, p=1.5e6+(1e6-1.5e6)//4=1375000
    croston = 8.5e6*1e6//1375000 = 6181818; sba = 7*c//8."""
    from etl_neotel_sql_automation_spark.workload.wave33 import (
        croston_frame,
    )

    rows = [
        (0, _d(2), 8.0),
        (0, _d(5), 16.0),
        (0, _d(6), 4.0),
    ]
    r = croston_frame(
        spark.read.parquet(_li(spark, tmp_path, rows) + "/lineitem.parquet")
    ).collect()[0]
    assert r["n_demands"] == 3
    assert r["size_micro"] == 8_500_000
    assert r["interval_micro"] == 1_375_000
    assert r["croston_micro"] == (8_500_000 * 1_000_000) // 1_375_000
    assert r["sba_micro"] == (7 * r["croston_micro"]) // 8


def test_croston_single_demand_is_seed(spark, tmp_path):
    """One demand event: outputs are the seeds (z = q*S, p = S) and
    the forecast equals the demand size."""
    from etl_neotel_sql_automation_spark.workload.wave33 import (
        croston_frame,
    )

    rows = [(1, _d(10), 5.0)]
    r = croston_frame(
        spark.read.parquet(_li(spark, tmp_path, rows) + "/lineitem.parquet")
    ).collect()[0]
    assert r["size_micro"] == 5_000_000
    assert r["interval_micro"] == 1_000_000
    assert r["croston_micro"] == 5_000_000_000_000 // 1_000_000


def test_croston_interval_tracks_sparsity(spark, tmp_path):
    """Two parts with identical demand sizes, one demanding daily and
    one every 8 days: the sparse part's smoothed interval must exceed
    the dense part's, and its per-day rate forecast must be lower —
    the property that distinguishes Croston from size-only
    smoothing."""
    from etl_neotel_sql_automation_spark.workload.wave33 import (
        croston_frame,
    )

    rows = [(0, _d(1 + i), 10.0) for i in range(8)]
    rows += [(1, _d(1 + 8 * i) if 1 + 8 * i <= 28 else _d(28), 10.0)
             for i in range(4)]
    rows = [(p, d, q) for p, d, q in rows]
    r = {
        row["l_partkey"]: row
        for row in croston_frame(
            spark.read.parquet(
                _li(spark, tmp_path, rows) + "/lineitem.parquet"
            )
        ).collect()
    }
    assert r[1]["interval_micro"] > r[0]["interval_micro"]
    assert r[1]["croston_micro"] < r[0]["croston_micro"]
    # same sizes -> same smoothed size
    assert r[1]["size_micro"] == r[0]["size_micro"]
