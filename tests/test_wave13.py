"""Fixture tests for the wave-13 (round 6) workloads — semantics the
oracle differential cannot pin: Wasserstein's metric behavior (a known
$10 shift costs exactly $10; identical windows cost exactly zero),
Mann-Whitney's tie-averaged ranks against a hand-computed example, and
the lexical-diversity extremes (all-same vs all-distinct sources).
"""

from __future__ import annotations

import datetime


def _orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_wasserstein_zero_on_identical_windows(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave13 import (
        quality_wasserstein_drift,
    )

    rows = []
    for i, v in enumerate([100.0, 250.0, 250.0, 900.0] * 5):
        rows.append((i, 1, "O", v, datetime.datetime(1996, 1, 2), "1-URGENT"))
        rows.append((1000 + i, 1, "O", v, datetime.datetime(1999, 1, 2), "2-HIGH"))
    sf = _orders(spark, tmp_path, rows)
    row = quality_wasserstein_drift(spark, sf).collect()[0]
    assert row["w1_microdollars"] == 0
    assert row["n_ref"] == row["n_cur"] == 20


def test_wasserstein_known_shift_is_exact(spark, tmp_path):
    """ref all at $100, cur all at $110: |F_ref - F_cur| = 1 over a
    $10 gap -> W1 is exactly 10 dollars = 10_000_000 micro-dollars."""
    from etl_neotel_sql_automation_spark.workload.wave13 import (
        quality_wasserstein_drift,
    )

    rows = []
    for i in range(10):
        rows.append((i, 1, "O", 100.0, datetime.datetime(1996, 1, 2), "x"))
        rows.append((100 + i, 1, "O", 110.0, datetime.datetime(1999, 1, 2), "x"))
    sf = _orders(spark, tmp_path, rows)
    row = quality_wasserstein_drift(spark, sf).collect()[0]
    assert row["w1_microdollars"] == 10_000_000
    assert row["n_support"] == 2


def test_mann_whitney_hand_computed_ties(spark, tmp_path):
    """A = {1, 2, 2} (URGENT), B = {2, 3}: tie-averaged ranks give
    R_A = 7, U_A = 1 (doubled: 2), AUC = 1/6."""
    from etl_neotel_sql_automation_spark.workload.wave13 import agg_mann_whitney

    rows = [
        (1, 1, "O", 1.0, datetime.datetime(1996, 1, 2), "1-URGENT"),
        (2, 1, "O", 2.0, datetime.datetime(1996, 1, 2), "1-URGENT"),
        (3, 1, "O", 2.0, datetime.datetime(1996, 1, 2), "1-URGENT"),
        (4, 1, "O", 2.0, datetime.datetime(1996, 1, 2), "2-HIGH"),
        (5, 1, "O", 3.0, datetime.datetime(1996, 1, 2), "2-HIGH"),
    ]
    sf = _orders(spark, tmp_path, rows)
    row = agg_mann_whitney(spark, sf).collect()[0]
    assert (row["n_urgent"], row["n_other"]) == (3, 2)
    assert row["u_urgent_x2"] == 2
    assert row["u_other_x2"] == 2 * 3 * 2 - 2
    assert row["auc_ppm"] == (1_000_000 * 2) // (2 * 3 * 2)


def test_mann_whitney_u_partition_on_real_data(spark):
    from etl_neotel_sql_automation_spark.workload.wave13 import agg_mann_whitney

    row = agg_mann_whitney(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["u_urgent_x2"] + row["u_other_x2"] == 2 * row["n_urgent"] * row["n_other"]
    assert 0 <= row["auc_ppm"] <= 1_000_000


def test_lexical_diversity_extremes(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave13 import (
        text_lexical_diversity,
    )

    df = spark.createDataFrame(
        [
            (0, "a a a a", "en", "same"),
            (1, "x y zz", "en", "uniq"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in text_lexical_diversity(spark, str(tmp_path)).collect()}
    same, uniq = out["same"], out["uniq"]
    assert (same["n_tokens"], same["n_types"]) == (4, 1)
    assert same["ttr_ppm"] == 250_000
    assert same["hapax_ppm"] == 0
    assert same["mean_token_millichars"] == 1_000
    assert (uniq["n_tokens"], uniq["n_types"]) == (3, 3)
    assert uniq["ttr_ppm"] == 1_000_000
    assert uniq["hapax_ppm"] == 1_000_000
    # "x","y","zz" -> 4 chars over 3 tokens
    assert uniq["mean_token_millichars"] == 4_000 // 3
