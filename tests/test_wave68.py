"""Fixture test for the wave-68 (round 8) Little's-law profile — a
three-line, two-month corpus with a month-straddling line and a
same-day ship (zero WIP contribution), every cell replayed by hand.
"""

from __future__ import annotations

import datetime


def test_monthly_wip_replayed_by_hand(spark):
    from etl_neotel_sql_automation_spark.workload.wave68 import littles_frame

    d = datetime.date
    orders = spark.createDataFrame(
        [
            (1, d(2023, 1, 10)),
            (2, d(2023, 1, 30)),
            (3, d(2023, 2, 5)),
        ],
        "o_orderkey long, o_orderdate date",
    )
    lineitem = spark.createDataFrame(
        [
            (1, d(2023, 1, 13)),  # dur 3: in flight Jan 10-12
            (2, d(2023, 2, 2)),  # dur 3: Jan 30-31 + Feb 1
            (3, d(2023, 2, 5)),  # same-day ship: zero WIP
        ],
        "l_orderkey long, l_shipdate date",
    )
    got = {
        r["month_start"].isoformat(): r
        for r in littles_frame(orders, lineitem).collect()
    }
    assert sorted(got) == ["2023-01-01", "2023-02-01"]
    jan = got["2023-01-01"]
    assert jan["days_in_month"] == 31
    assert jan["n_arrived"] == 2
    assert jan["open_line_days"] == 5  # 3 (line 1) + 2 (line 2)
    assert jan["mean_latency_days"] == 3.0
    assert jan["avg_wip"] == round(5 / 31, 6)
    assert jan["littles_ratio"] == round(5 / 6, 6)
    feb = got["2023-02-01"]
    assert feb["days_in_month"] == 28
    assert feb["n_arrived"] == 1
    assert feb["open_line_days"] == 1  # line 2 on Feb 1
    assert feb["mean_latency_days"] == 0.0  # the same-day line
    assert feb["littles_ratio"] is None  # dur_days = 0 guard
