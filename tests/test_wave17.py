"""Fixture tests for the wave-17 (round 6) workloads — semantics the
oracle differential cannot pin: Spearman's monotone extremes (+1/-1
exactly) and a hand-computed tie case, Kruskal-Wallis against a
hand-computed no-tie example, modularity's perfectly-assortative
partition (Q = 0.5 exactly for two pure blocks) and its degree-mass
partition invariant, and coding length's two extremes (uniform source
hits its ln(V) bound; a one-type source codes to exactly zero with a
NULL ratio, the nullif guard).
"""

from __future__ import annotations

import datetime
import math

SF = "/root/testdata/sf0.001"


def _lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_spearman_monotone_extremes(spark, tmp_path):
    """A strictly increasing y-of-x relation has rho exactly +1, a
    strictly decreasing one exactly -1 — regardless of how nonlinear
    the values are (the property that separates Spearman from
    Pearson)."""
    from etl_neotel_sql_automation_spark.workload.wave17 import agg_spearman_corr

    up = [(i, float(i + 1), float((i + 1) ** 3)) for i in range(8)]
    row = agg_spearman_corr(spark, _lineitem(spark, tmp_path, up)).collect()[0]
    assert row["n_rows"] == 8
    assert row["rho_spearman"] == 1.0

    down = [(i, float(i + 1), float((20 - i) ** 2)) for i in range(8)]
    d2 = tmp_path / "d2"
    d2.mkdir()
    row2 = agg_spearman_corr(spark, _lineitem(spark, d2, down)).collect()[0]
    assert row2["rho_spearman"] == -1.0


def test_spearman_hand_computed_ties(spark, tmp_path):
    """x = [1, 2, 2, 3], y = [1, 1, 2, 2]: average ranks
    rx = [1, 2.5, 2.5, 4], ry = [1.5, 1.5, 3.5, 3.5] ->
    centered Sxy = 3.0, Sxx = 4.5, Syy = 4.0 ->
    rho = 3/sqrt(18) ≈ 0.707107."""
    from etl_neotel_sql_automation_spark.workload.wave17 import agg_spearman_corr

    rows = [(0, 1.0, 1.0), (1, 2.0, 1.0), (2, 2.0, 2.0), (3, 3.0, 2.0)]
    row = agg_spearman_corr(spark, _lineitem(spark, tmp_path, rows)).collect()[0]
    expect = round(3.0 / math.sqrt(4.5) / math.sqrt(4.0), 6)
    assert row["rho_spearman"] == expect


def test_kruskal_wallis_hand_computed(spark, tmp_path):
    """Groups A = {1, 2}, B = {3, 4} (no ties): ranks 1..4,
    R_A = 3, R_B = 7 -> H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4."""
    from etl_neotel_sql_automation_spark.workload.wave17 import agg_kruskal_wallis

    d = datetime.datetime(1996, 1, 2)
    rows = [
        (0, 1, 1.0, d, "A"),
        (1, 1, 2.0, d, "A"),
        (2, 1, 3.0, d, "B"),
        (3, 1, 4.0, d, "B"),
    ]
    out = agg_kruskal_wallis(spark, _orders(spark, tmp_path, rows)).collect()
    by = {r["o_orderpriority"]: r for r in out}
    assert by["A"]["n_c"] == 2 and by["B"]["n_c"] == 2
    # doubled rank sums: A = 2+4, B = 6+8
    assert by["A"]["rank_sum_x2"] == 6 and by["B"]["rank_sum_x2"] == 14
    assert all(r["h_stat"] == 2.4 for r in out)
    assert all(r["n_total"] == 4 and r["k_groups"] == 2 for r in out)


def test_kruskal_wallis_identical_groups_is_zero(spark, tmp_path):
    """Two groups drawing the identical value multiset rank
    identically: H = 0 exactly (tie correction < 1 but the numerator
    is exactly zero)."""
    from etl_neotel_sql_automation_spark.workload.wave17 import agg_kruskal_wallis

    d = datetime.datetime(1996, 1, 2)
    rows = []
    oid = 0
    for grp in ("A", "B"):
        for v in (10.0, 20.0, 30.0):
            rows.append((oid := oid + 1, 1, v, d, grp))
    out = agg_kruskal_wallis(spark, _orders(spark, tmp_path, rows)).collect()
    assert all(r["h_stat"] == 0.0 for r in out)


def _graph_fixture(spark, tmp_path, pairs, cust_nation, supp_nation):
    d = datetime.datetime(1996, 1, 2)
    orders, lineitem = [], []
    for oid, (ck, sk) in enumerate(pairs):
        orders.append((oid, ck, 1.0, d, "x"))
        lineitem.append((oid, sk, 1.0, 1.0))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, f"c{k}", int(n)) for k, n in cust_nation.items()],
        "c_custkey long, c_name string, c_nationkey int",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(k, f"s{k}", int(n)) for k, n in supp_nation.items()],
        "s_suppkey long, s_name string, s_nationkey int",
    ).write.parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    return str(tmp_path)


def test_modularity_perfectly_assortative_blocks(spark, tmp_path):
    """Two nation-pure blocks of 2 edges each: m = 4, e_c = 2,
    d_c = 4 -> each contribution = 2/4 - (4/8)^2 = 0.25, Q = 0.5
    exactly (500000 ppm)."""
    from etl_neotel_sql_automation_spark.workload.wave17 import (
        graph_modularity_nations,
    )

    pairs = [(1, 11), (2, 12), (3, 13), (4, 14)]
    cn = {1: 0, 2: 0, 3: 1, 4: 1}
    sn = {11: 0, 12: 0, 13: 1, 14: 1}
    sf = _graph_fixture(spark, tmp_path, pairs, cn, sn)
    out = {r["n_nationkey"]: r for r in
           graph_modularity_nations(spark, sf).collect()}
    for k in (0, 1):
        assert out[k]["e_intra"] == 2
        assert out[k]["d_degree"] == 4
        assert out[k]["contribution_ppm"] == 250_000
    assert all(r["q_ppm"] == 500_000 for r in out.values())


def test_modularity_invariants_on_real_data(spark):
    """Partition accounting: degree mass sums to 2m and intra edges
    cannot exceed m, where m is recovered from the perfectly-known
    relation sum(d_degree) = 2m; random-graph null: |Q| < 1."""
    from etl_neotel_sql_automation_spark.workload.wave17 import (
        graph_modularity_nations,
    )

    out = graph_modularity_nations(spark, SF).collect()
    assert len(out) == 25
    m2 = sum(r["d_degree"] for r in out)
    assert m2 % 2 == 0 and m2 > 0
    assert sum(r["e_intra"] for r in out) <= m2 // 2
    assert sum(r["contribution_ppm"] for r in out) == out[0]["q_ppm"]
    assert abs(out[0]["q_ppm"]) < 1_000_000


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_coding_length_extremes(spark, tmp_path):
    """A uniform source (every token distinct) codes at exactly its
    ln(V) bound -> ratio 1000000 ppm; a one-type source codes to 0
    micro-nats with a NULL ratio (nullif guard, ln(1) = 0)."""
    from etl_neotel_sql_automation_spark.workload.wave17 import text_coding_length

    uniform = " ".join(f"tok{i}" for i in range(16))
    rows = [
        (0, uniform, "en", "uniform"),
        (1, "same same same same", "en", "onetype"),
    ]
    out = {r["source"]: r for r in
           text_coding_length(spark, _docs(spark, tmp_path, rows)).collect()}
    u = out["uniform"]
    assert u["n_tokens"] == 16 and u["n_types"] == 16
    assert u["coding_micronats"] == 16 * round(math.log(16) * 1e6)
    assert u["compression_ratio_ppm"] == 1_000_000
    o = out["onetype"]
    assert o["n_types"] == 1
    assert o["coding_micronats"] == 0
    assert o["compression_ratio_ppm"] is None
