"""Fixture tests for the wave-40 (round 7) workloads — the airport
Shapley allocation checked against its defining axioms on a
hand-solvable instance, and the ABC-XYZ classes forced onto a
population where every cell is constructed.
"""

from __future__ import annotations

import datetime


def test_shapley_airport_hand_solved(spark, tmp_path):
    """Requirements 300 / 300 / 600 cents (three priorities): the
    first increment 300 splits three ways (100 each), the remaining
    300 is paid by the largest class alone — shares 100/100/400, and
    efficiency (sum = max requirement) holds exactly because every
    division is exact here."""
    from etl_neotel_sql_automation_spark.workload.wave40 import (
        alloc_shapley_airport,
    )

    d = datetime.datetime(1996, 1, 2)
    rows = [
        (0, 1, "F", 3.0, d, "1-URGENT"),
        (1, 1, "F", 3.0, d, "2-HIGH"),
        (2, 1, "F", 6.0, d, "3-MEDIUM"),
        (3, 1, "F", 1.0, d, "3-MEDIUM"),  # non-max order in the class
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    res = {
        r["priority"]: r
        for r in alloc_shapley_airport(spark, str(tmp_path)).collect()
    }
    assert res["1-URGENT"]["shapley_micro_cents"] == 100 * 1_000_000
    assert res["2-HIGH"]["shapley_micro_cents"] == 100 * 1_000_000
    assert res["3-MEDIUM"]["shapley_micro_cents"] == 400 * 1_000_000
    # efficiency: total allocated = cost of the largest requirement
    assert (
        sum(r["shapley_micro_cents"] for r in res.values())
        == 600 * 1_000_000
    )
    # requirement is the class MAX (the 1.0 order is ignored)
    assert res["3-MEDIUM"]["req_cents"] == 600


def test_abc_xyz_constructed_cells(spark, tmp_path):
    """Three parts: a dominant steady part (A/X: 80% of revenue,
    constant monthly demand), a mid erratic part (B or C / Z:
    feast-or-famine months), and a small steady tail part. Class
    boundaries and dispersion checked cell by cell."""
    from etl_neotel_sql_automation_spark.workload.wave40 import (
        lineitem_abc_xyz,
    )

    rows = []
    k = 0

    def li(part, month, qty, price):
        nonlocal k
        k += 1
        return (
            k, part, 1, 1, float(qty), float(price), 0.0, 0.0, "N", "O",
            datetime.datetime(1996, month, 5),
        )

    # part 0: 4 months x qty 10, price 2000 -> revenue 800000 cents
    for m in range(1, 5):
        rows.append(li(0, m, 10, 2000.0))
    # part 1: qty 1 and 19 across 2 months (high dispersion),
    # revenue 150000 cents
    rows.append(li(1, 1, 1, 750.0))
    rows.append(li(1, 2, 19, 750.0))
    # part 2: 2 months x qty 5, revenue 50000 cents
    rows.append(li(2, 1, 5, 250.0))
    rows.append(li(2, 2, 5, 250.0))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    res = {
        (r["abc_class"], r["xyz_class"]): r
        for r in lineitem_abc_xyz(spark, str(tmp_path)).collect()
    }
    # part 0: cum 80% -> B boundary? 800000/1000000 = 800000 ppm > 700000
    # -> class B by the 70% cut; constant demand -> dispersion 0 -> X
    assert res[("B", "X")]["n_parts"] == 1
    assert res[("B", "X")]["revenue_share_ppm"] == 800_000
    # part 1: cum 95% exactly -> B; dispersion of (1, 19):
    # (2*(1+361) - 400)/400 = 0.81 -> Y/Z boundary: 810000 ppm -> Y
    assert ("B", "Y") in res
    # part 2: cum 100% -> C; constant -> X
    assert res[("C", "X")]["n_parts"] == 1
