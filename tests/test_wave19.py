"""Fixture tests for the wave-19 (round 6) workloads — semantics the
oracle differential cannot pin: the knapsack's greedy optimality
(highest-TTR docs admitted first, budget never exceeded, admission
stops at the first doc that would overflow), the sensitivity audit's
clip bounds on a hand-built contribution pattern, Theil's two analytic
extremes (perfect equality = 0 everywhere; decomposition ~= total
within per-term rounding on real data), and the seasonal decomposer
recovering a PLANTED weekly pattern exactly on a trendless series.
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_knapsack_greedy_admission(spark, tmp_path):
    """Docs of 10 tokens each with TTR 1.0 / 0.5 / 0.3 / 0.2; budget =
    50% of 40 = 20 tokens -> exactly the top-2 TTR docs are admitted
    and the threshold is the 2nd doc's TTR."""
    from etl_neotel_sql_automation_spark.workload.wave19 import (
        curation_greedy_knapsack,
    )

    def doc(n_unique):
        toks = [f"u{i}" for i in range(n_unique)]
        while len(toks) < 10:
            toks.append(toks[0])  # pad with an existing type
        return " ".join(toks[:10])

    rows = [
        (0, doc(10), "en", "a"),   # TTR 1.0
        (1, doc(5), "en", "a"),    # TTR 0.5
        (2, doc(3), "en", "b"),    # TTR 0.3
        (3, doc(2), "en", "b"),    # TTR 0.2
    ]
    out = {r["source"]: r for r in
           curation_greedy_knapsack(spark, _docs(spark, tmp_path, rows)).collect()}
    assert out["a"]["n_selected"] == 2 and out["b"]["n_selected"] == 0
    assert out["a"]["tokens_selected"] == 20
    assert out["a"]["min_value_ppm"] == 500_000
    assert out["b"]["tokens_selected"] == 0 and out["b"]["min_value_ppm"] == 0


def test_knapsack_budget_never_exceeded_on_real_data(spark):
    from etl_neotel_sql_automation_spark.workload.wave19 import (
        curation_greedy_knapsack,
    )

    out = curation_greedy_knapsack(spark, SF).collect()
    total = sum(r["n_tokens"] for r in out)
    spent = sum(r["tokens_selected"] for r in out)
    assert 0 < spent <= total // 2
    assert sum(r["n_selected"] for r in out) > 0


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_sensitivity_audit_clip_bounds(spark, tmp_path):
    """Customer 1 places 3 orders in cell A and 2 in cell B (L1 = 5);
    customer 2 places 1 in A: cell A's clip bound is 3, cell B's is 2,
    the user L1 is 5 on every row."""
    from etl_neotel_sql_automation_spark.workload.wave19 import (
        privacy_sensitivity_audit,
    )

    d = datetime.datetime(1996, 1, 2)
    rows = [(i, 1, 1.0, d, "A") for i in range(3)]
    rows += [(10 + i, 1, 1.0, d, "B") for i in range(2)]
    rows += [(20, 2, 1.0, d, "A")]
    out = {r["o_orderpriority"]: r for r in
           privacy_sensitivity_audit(spark, _orders(spark, tmp_path, rows)).collect()}
    assert out["A"]["max_user_contrib"] == 3 and out["A"]["n_users"] == 2
    assert out["B"]["max_user_contrib"] == 2 and out["B"]["n_users"] == 1
    assert all(r["user_l1_sensitivity"] == 5 for r in out.values())


def _theil_fixture(spark, tmp_path, spends):
    """spends: list of (custkey, nationkey, dollars)."""
    d = datetime.datetime(1996, 1, 2)
    orders = [
        (i, ck, float(v), d, "x") for i, (ck, _, v) in enumerate(spends)
    ]
    cust = [(ck, f"c{ck}", nk) for ck, nk, _ in spends]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_nationkey int"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def test_theil_zero_under_perfect_equality(spark, tmp_path):
    """Everyone spends the same: every ln term is ln(1) = 0, so the
    total, between, and within components are all exactly zero."""
    from etl_neotel_sql_automation_spark.workload.wave19 import (
        orders_theil_decomposition,
    )

    spends = [(ck, ck % 2, 100.0) for ck in range(1, 9)]
    out = orders_theil_decomposition(
        spark, _theil_fixture(spark, tmp_path, spends)
    ).collect()
    assert all(r["theil_total_micro"] == 0 for r in out)
    assert all(r["theil_between_micro"] == 0 for r in out)
    assert all(r["theil_within_micro"] == 0 for r in out)


def test_theil_decomposition_identity_on_real_data(spark):
    """T_total ~= T_between + sum_g (S_g/S) * T_within_g, exact up to
    per-term micro-nat rounding (bounded by a few micro-nats per
    term)."""
    from etl_neotel_sql_automation_spark.workload.wave19 import (
        orders_theil_decomposition,
    )

    out = orders_theil_decomposition(spark, SF).collect()
    total = out[0]["theil_total_micro"]
    between = out[0]["theil_between_micro"]
    s = sum(r["spend_cents"] for r in out)
    within_weighted = (
        sum(r["spend_cents"] * r["theil_within_micro"] for r in out) // s
    )
    assert total > 0
    assert abs(total - (between + within_weighted)) <= 25  # micro-nats
    assert 0 <= between <= total


def test_seasonal_decompose_recovers_planted_pattern(spark, tmp_path):
    """A trendless series with a planted +$5 Friday bump: the Friday
    seasonal index is exactly the bump minus the bump's own share of
    the weekly trend (5 - 5/7 dollars = 429 cents at cent floor), and
    every other weekday absorbs -5/7 dollars (-72 cents)."""
    from etl_neotel_sql_automation_spark.workload.wave19 import (
        timeseries_seasonal_decompose,
    )

    base = datetime.date(1996, 1, 1)  # a Monday
    rows = []
    for i in range(28):
        day = base + datetime.timedelta(days=i)
        v = 100.0 + (5.0 if day.weekday() == 4 else 0.0)  # Friday bump
        rows.append(
            (i, 1, v, datetime.datetime(day.year, day.month, day.day), "x")
        )
    out = {r["day_of_week"]: r for r in
           timeseries_seasonal_decompose(
               spark, _orders(spark, tmp_path, rows)
           ).collect()}
    # Spark dayofweek: 1=Sunday ... 6=Friday
    # trend on every interior day = (6*100 + 105)/7 = 10071 cents (floor)
    fri = out[6]
    assert fri["seasonal_cents"] == 10500 - 10071
    others = [r for k, r in out.items() if k != 6]
    assert all(r["seasonal_cents"] == 10000 - 10071 for r in others)
    assert all(r["n_days"] >= 3 for r in out.values())
