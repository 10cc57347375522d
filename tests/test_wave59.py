"""Fixture test for the wave-59 (round 8) energy distance — the
prefix-ladder sums checked against the brute-force O(n*m) pairwise
definition on a small corpus with cross- and within-sample ties, plus
the identical-samples zero axiom.
"""

from __future__ import annotations


def _orders(spark, xs, ys):
    rows = []
    ok = 0
    for v in xs:
        rows.append((ok, "1-URGENT", v / 100.0))
        ok += 1
    for v in ys:
        rows.append((ok, "5-LOW", v / 100.0))
        ok += 1
    rows.append((ok, "3-MEDIUM", 999.0))  # filtered out
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )


def _brute(xs, ys):
    a = sum(abs(x - y) for x in xs for y in ys)
    b = sum(abs(p - q) for p in xs for q in xs)
    c = sum(abs(p - q) for p in ys for q in ys)
    n, m = len(xs), len(ys)
    dsq = 2 * a / (n * m) - b / (n * n) - c / (m * m)
    return a, b, c, dsq


def test_energy_distance_matches_brute_force_with_ties(spark):
    from etl_neotel_sql_automation_spark.workload.wave59 import (
        energy_distance_frame,
    )

    xs = [100, 200, 200, 500]  # within-sample tie at 200
    ys = [100, 300, 300]  # cross-sample tie at 100, within tie at 300
    [r] = energy_distance_frame(_orders(spark, xs, ys)).collect()
    a, b, c, dsq = _brute(xs, ys)
    assert (r["n_x"], r["n_y"]) == (4, 3)
    assert r["sum_cross_abs"] == a
    assert r["sum_within_x"] == b
    assert r["sum_within_y"] == c
    assert r["energy_dsq"] == round(dsq, 6)
    assert r["energy_d"] == round(dsq ** 0.5, 6)


def test_energy_distance_zero_for_identical_samples(spark):
    from etl_neotel_sql_automation_spark.workload.wave59 import (
        energy_distance_frame,
    )

    vals = [150, 250, 250, 400]
    [r] = energy_distance_frame(_orders(spark, vals, vals)).collect()
    assert r["energy_dsq"] == 0.0
    assert r["energy_d"] == 0.0
    assert r["sum_cross_abs"] == r["sum_within_x"] == r["sum_within_y"]
