"""Fixture test for the wave-45 (round 8) forecast reconciliation —
two nations with DIFFERENT month supports so the level folds genuinely
disagree (Holt is linear in y on a shared support, where incoherence
would be identically zero): every output column is replayed by an
independent Python implementation of the dyadic fold.
"""

from __future__ import annotations

import datetime


def _holt_fc(ys):
    l, b = ys[0] * 1_000_000, 0
    for y in ys[1:]:
        nl = (y * 1_000_000 + l + b) // 2
        b = b + (nl - l - b) // 4
        l = nl
    return l + b


def test_reconcile_hand_replay(spark):
    from etl_neotel_sql_automation_spark.workload.wave45 import (
        reconcile_hierarchy_frame,
    )

    m = [datetime.datetime(2024, k, 1) for k in (1, 2, 3)]
    orders = spark.createDataFrame(
        [
            # nation A: kilodollar series 10, 20, 30
            (1, 0, m[0], 10_000.0),
            (2, 0, m[1], 20_000.0),
            (3, 0, m[2], 30_000.0),
            # nation B: 5 at m1, 7 at m3 — no m2 observation
            (4, 1, m[0], 5_000.0),
            (5, 1, m[2], 7_000.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(0, 0), (1, 1)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(0, "N_A", 0), (1, "N_B", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(0, "R0")], "r_regionkey long, r_name string"
    )
    got = {
        r["n_name"]: r
        for r in reconcile_hierarchy_frame(
            orders, cust, nation, region
        ).collect()
    }

    fc_a = _holt_fc([10, 20, 30])
    fc_b = _holt_fc([5, 7])
    fc_r = _holt_fc([15, 20, 37])  # union support: m2 is A alone
    bu = fc_a + fc_b
    assert got["N_A"]["nation_fc_micro"] == fc_a
    assert got["N_B"]["nation_fc_micro"] == fc_b
    assert got["N_A"]["region_fc_micro"] == fc_r
    assert got["N_A"]["bu_region_fc_micro"] == bu
    assert bu != fc_r  # the series genuinely disagree on this support
    # top-down proportional split: totals 60 vs 12 of 72
    assert got["N_A"]["td_nation_fc_micro"] == (fc_r * 60) // 72
    assert got["N_B"]["td_nation_fc_micro"] == (fc_r * 12) // 72
    want_inc = (1_000_000 * abs(fc_r - bu)) // fc_r
    assert got["N_A"]["incoherence_ppm"] == want_inc
    assert got["N_B"]["incoherence_ppm"] == want_inc
