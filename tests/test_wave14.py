"""Fixture tests for the wave-14 (round 6) workloads — semantics the
oracle differential cannot pin: the CMS join-size estimate's one-sided
bias and its exactness on a collision-free key set, KS extremes
(identical windows -> 0, disjoint supports -> 1e6 at the pinned
location), and the coverage curve's monotonicity/saturation.
"""

from __future__ import annotations

import datetime


def test_join_size_estimate_exact_on_small_keyset(spark, tmp_path):
    """10 distinct keys in 4 x 2048 buckets: at least one hash row is
    collision-free, so min-over-rows recovers the exact join size
    (sum k for k=1..10 = 55) and overest_ppm is exactly 0."""
    from etl_neotel_sql_automation_spark.workload.wave14 import (
        diag_join_size_estimate,
    )

    orders = spark.createDataFrame(
        [(k, 1, "O", 1.0, datetime.datetime(1996, 1, 2), "x") for k in range(1, 11)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(k, i) for k in range(1, 11) for i in range(k)],
        "l_orderkey long, l_linenumber long",
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    row = diag_join_size_estimate(spark, str(tmp_path)).collect()[0]
    assert row["exact_rows"] == 55
    assert row["est_rows"] == 55
    assert row["overest_ppm"] == 0


def test_join_size_estimate_is_upper_bound(spark):
    from etl_neotel_sql_automation_spark.workload.wave14 import (
        diag_join_size_estimate,
    )

    row = diag_join_size_estimate(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["est_rows"] >= row["exact_rows"] > 0
    assert row["overest_ppm"] >= 0


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_ks_zero_on_identical_windows(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave14 import quality_ks_drift

    rows = []
    for i, v in enumerate([100.0, 250.0, 900.0] * 4):
        rows.append((i, 1, "O", v, datetime.datetime(1996, 1, 2), "x"))
        rows.append((100 + i, 1, "O", v, datetime.datetime(1999, 1, 2), "x"))
    row = quality_ks_drift(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert row["ks_ppm"] == 0
    # the supremum (trivially 0) is attained at the smallest support value
    assert row["ks_at_dollars"] == 100


def test_ks_one_on_disjoint_supports(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave14 import quality_ks_drift

    rows = []
    for i in range(8):
        rows.append((i, 1, "O", 100.0, datetime.datetime(1996, 1, 2), "x"))
        rows.append((100 + i, 1, "O", 200.0, datetime.datetime(1999, 1, 2), "x"))
    row = quality_ks_drift(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert row["ks_ppm"] == 1_000_000
    assert row["ks_at_dollars"] == 100


def test_ngram_coverage_known_counts(spark, tmp_path):
    """'x y x y x y' -> bigrams {x y: 3, y x: 2}: 5 occurrences over 2
    types; every curve point saturates at 1e6."""
    from etl_neotel_sql_automation_spark.workload.wave14 import (
        text_ngram_coverage,
    )

    spark.createDataFrame(
        [(0, "x y x y x y", "en", "s")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = text_ngram_coverage(spark, str(tmp_path)).collect()
    assert [r["top_n"] for r in out] == [100, 1000, 10000]
    assert all(r["n_types"] == 2 and r["n_occurrences"] == 5 for r in out)
    assert all(r["covered"] == 5 and r["coverage_ppm"] == 1_000_000 for r in out)


def test_ngram_coverage_monotone_on_real_data(spark):
    from etl_neotel_sql_automation_spark.workload.wave14 import (
        text_ngram_coverage,
    )

    out = text_ngram_coverage(spark, "/root/testdata/sf0.001").collect()
    cov = [r["coverage_ppm"] for r in out]
    assert cov == sorted(cov)
    assert all(0 < r["covered"] <= r["n_occurrences"] for r in out)
    # saturation: once top_n >= n_types the curve must be exactly 1e6
    for r in out:
        if r["top_n"] >= r["n_types"]:
            assert r["coverage_ppm"] == 1_000_000
