"""Fixture test for the wave-72 (round 8) Neyman allocation — two
hand-built activity strata with known means/SDs, the quantized
allocation shares and the fixed-budget variance ratio replayed with
an independent Python-int reference.
"""

from __future__ import annotations

import datetime
import math


def test_neyman_allocation_replayed(spark):
    from etl_neotel_sql_automation_spark.workload.wave72 import neyman_frame

    ts = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # stratum 0 (2 events/user, count div 25 = 0): totals 100/300/100/300
    # stratum 1 (25 events/user): totals 1000 and 5000
    totals0 = [100, 300, 100, 300]
    for uid, tot in enumerate(totals0):
        for _ in range(2):
            rows.append((eid, ts, uid, "view", tot / 2 / 100.0))
            eid += 1
    for uid, tot in ((10, 1000), (11, 5000)):
        for _ in range(25):
            rows.append((eid, ts, uid, "view", tot / 25 / 100.0))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {r["stratum"]: r for r in neyman_frame(ev).collect()}
    assert sorted(got) == [0, 1]

    def sd(vals):
        n = len(vals)
        m = sum(vals) / n
        return math.sqrt(sum((v - m) ** 2 for v in vals) / (n - 1))

    sd0, sd1 = sd(totals0), sd([1000, 5000])
    assert got[0]["n_h"] == 4 and got[1]["n_h"] == 2
    assert got[0]["mean_cents"] == 200.0
    assert got[0]["sd_cents"] == round(sd0, 6)
    assert got[1]["sd_cents"] == round(sd1, 6)
    w0 = 4 * round(sd0 * 1e6)
    w1 = 2 * round(sd1 * 1e6)
    assert got[0]["neyman_share_ppm"] == (1_000_000 * w0) // (w0 + w1)
    assert got[1]["neyman_share_ppm"] == (1_000_000 * w1) // (w0 + w1)
    assert got[0]["prop_share_ppm"] == (1_000_000 * 4) // 6
    nvar = 4 * round(sd0 * 1e6) ** 2 + 2 * round(sd1 * 1e6) ** 2
    expect_ratio = float(w0 + w1) ** 2 / (6.0 * float(nvar))
    assert got[0]["neyman_vs_prop"] == round(expect_ratio, 6)
    # unequal SDs -> optimizing must strictly beat proportional
    assert got[0]["neyman_vs_prop"] < 1.0
