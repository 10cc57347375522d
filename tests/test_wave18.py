"""Fixture tests for the wave-18 (round 6) workloads — semantics the
oracle differential cannot pin: the orphan audit actually catches a
planted orphan (and counts a NULL FK as one), anisotropy's two
analytic extremes (an isotropic +/-1 corpus has zero mean mass and
full effective dimensionality; a rank-1 corpus concentrates
everything), and the Holt recurrence on hand-foldable series (a
constant series locks level = y and trend = 0 with zero error; a
clean linear ramp's recurrence replayed step-for-step in python).
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def test_referential_orphans_all_clean_on_testdata(spark):
    from etl_neotel_sql_automation_spark.workload.wave18 import (
        dq_referential_orphans,
    )

    out = dq_referential_orphans(spark, SF).collect()
    assert len(out) == 7
    assert all(r["n_orphan"] == 0 and r["orphan_ppm"] == 0 for r in out)
    assert all(r["n_child"] > 0 for r in out)


def test_referential_orphans_catches_planted_orphan(spark, tmp_path):
    """customer 99 references nation 77 which does not exist, and
    customer 100 carries a NULL nation: both are orphans of the
    customer.c_nationkey edge; every other edge stays clean."""
    from etl_neotel_sql_automation_spark.workload.wave18 import (
        referential_orphans_frame,
    )

    d = datetime.datetime(1996, 1, 2)
    tables = {
        "region": spark.createDataFrame([(0, "R")], "r_regionkey int, r_name string"),
        "nation": spark.createDataFrame(
            [(0, "N0", 0)], "n_nationkey int, n_name string, n_regionkey int"
        ),
        "customer": spark.createDataFrame(
            [(1, "a", 0), (99, "b", 77), (100, "c", None)],
            "c_custkey long, c_name string, c_nationkey int",
        ),
        "supplier": spark.createDataFrame(
            [(11, "s", 0)], "s_suppkey long, s_name string, s_nationkey int"
        ),
        "part": spark.createDataFrame([(5, "p")], "p_partkey long, p_name string"),
        "orders": spark.createDataFrame(
            [(1000, 1, d)], "o_orderkey long, o_custkey long, o_orderdate timestamp"
        ),
        "lineitem": spark.createDataFrame(
            [(1000, 5, 11)], "l_orderkey long, l_partkey long, l_suppkey long"
        ),
    }
    out = {r["fk_edge"]: r for r in referential_orphans_frame(tables).collect()}
    bad = out["customer.c_nationkey"]
    assert bad["n_child"] == 3 and bad["n_orphan"] == 2
    assert bad["orphan_ppm"] == 666_666
    for edge, r in out.items():
        if edge != "customer.c_nationkey":
            assert r["n_orphan"] == 0


def _emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_anisotropy_isotropic_corpus(spark, tmp_path):
    """The 4 sign patterns of (+/-1, +/-1): mean vector is exactly
    zero (mean_mass 0), both dims carry equal variance (top share
    500000 ppm), participation ratio = 2 dims exactly."""
    from etl_neotel_sql_automation_spark.workload.wave18 import (
        emb_anisotropy_ratio,
    )

    rows = [
        (0, [1.0, 1.0], 0),
        (1, [1.0, -1.0], 0),
        (2, [-1.0, 1.0], 0),
        (3, [-1.0, -1.0], 0),
    ]
    r = emb_anisotropy_ratio(spark, _emb(spark, tmp_path, rows)).collect()[0]
    assert r["n_vecs"] == 4 and r["n_dims"] == 2
    assert r["mean_mass_ppm"] == 0
    assert r["top_dim_var_ppm"] == 500_000
    assert r["effective_dims_milli"] == 2_000


def test_anisotropy_rank_one_corpus(spark, tmp_path):
    """All mass on one common direction: mean mass ~1e6 ppm, all
    variance in dim 1, participation ratio = 1 dim exactly."""
    from etl_neotel_sql_automation_spark.workload.wave18 import (
        emb_anisotropy_ratio,
    )

    rows = [(i, [float(1 + (i % 2)), 0.0], 0) for i in range(8)]
    r = emb_anisotropy_ratio(spark, _emb(spark, tmp_path, rows)).collect()[0]
    assert r["top_dim_var_ppm"] == 1_000_000
    assert r["effective_dims_milli"] == 1_000
    assert r["mean_mass_ppm"] > 850_000  # (mean 1.5)^2 / E[x^2]=2.5 = 0.9


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_holt_constant_series(spark, tmp_path):
    """A constant daily count folds to level = y, trend = 0, zero
    one-step error — every step's div is exact."""
    from etl_neotel_sql_automation_spark.workload.wave18 import (
        timeseries_holt_linear,
    )

    rows = []
    oid = 0
    for day in range(10):
        for _ in range(5):  # 5 orders every day
            rows.append((oid := oid + 1, 1,
                         datetime.datetime(1996, 1, 1 + day)))
    r = timeseries_holt_linear(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert r["n_days"] == 10
    assert r["level_micro"] == 5_000_000
    assert r["trend_micro"] == 0
    assert r["forecast30_micro"] == 5_000_000
    assert r["mae_micro"] == 0


def test_holt_matches_python_replay(spark, tmp_path):
    """The exact integer recurrence replayed in python over a ramp
    series (1, 2, ..., 12 orders/day) must agree bit-for-bit —
    including the truncating division on the (negative-capable)
    trend update."""
    from etl_neotel_sql_automation_spark.workload.wave18 import (
        timeseries_holt_linear,
    )

    S = 1_000_000
    ys = list(range(1, 13))
    rows = []
    oid = 0
    for day, y in enumerate(ys):
        for _ in range(y):
            rows.append((oid := oid + 1, 1,
                         datetime.datetime(1996, 1, 1 + day)))
    r = timeseries_holt_linear(spark, _orders(spark, tmp_path, rows)).collect()[0]

    def tdiv(a: int, b: int) -> int:  # truncate toward zero, like div
        q = abs(a) // b
        return q if a >= 0 else -q

    l, b, sae = ys[0] * S, 0, 0
    for y in ys[1:]:
        pred = l + b
        sae += abs(y * S - pred)
        l_new = tdiv(y * S + l + b, 2)
        b = b + tdiv(l_new - l - b, 4)
        l = l_new
    assert r["level_micro"] == l
    assert r["trend_micro"] == b
    assert r["forecast30_micro"] == l + 30 * b
    assert r["mae_micro"] == sae // (len(ys) - 1)
    # the trend should have locked onto the +1/day ramp direction
    assert r["trend_micro"] > 0
