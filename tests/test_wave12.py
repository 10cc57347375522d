"""Fixture tests for the wave-12 (round 6) workloads — semantics the
oracle differential cannot pin: the z-order layout must actually PRUNE
better than the linear sort (the differential only proves both engines
agree on the count); PSI must be exactly zero when the two windows
share a distribution; kappa must be exactly 1e6 under perfect
agreement; the bootstrap CI must bracket the point estimate; per-term
entropy rounding must keep the deliberate zero-gain feature at the
bottom of the info-gain ranking.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_zorder_layout_prunes_better_than_linear(spark):
    """At sf0.01 (30 simulated files) the Morton layout must scan
    strictly fewer files for the 2-D box than the custkey-sorted
    layout, while BOTH layouts agree on the matched-row count (layout
    can never change query results, only pruning)."""
    from etl_neotel_sql_automation_spark.workload.wave12 import io_zorder_layout

    rows = {r["layout"]: r for r in io_zorder_layout(spark, SF01).collect()}
    lin, zo = rows["linear_custkey"], rows["zorder"]
    assert lin["n_files"] == zo["n_files"]
    assert lin["rows_matched"] == zo["rows_matched"]
    assert zo["files_scanned"] < lin["files_scanned"]
    # envelope pruning can never skip a file that holds a matching row
    assert zo["files_scanned"] >= 1 and lin["files_scanned"] >= 1


def test_bootstrap_ci_brackets_point_estimate(spark):
    from etl_neotel_sql_automation_spark.workload.wave12 import agg_bootstrap_ci

    row = agg_bootstrap_ci(spark, SF).collect()[0]
    assert row["n_reps"] == 64
    assert (
        row["boot_p05_millicents"]
        <= row["boot_p50_millicents"]
        <= row["boot_p95_millicents"]
    )
    # half-sample replicate means center on the full-data mean
    assert row["boot_p05_millicents"] <= row["mean_millicents"] <= row["boot_p95_millicents"]


def test_bootstrap_ci_is_deterministic(spark):
    from etl_neotel_sql_automation_spark.workload.wave12 import agg_bootstrap_ci

    a = agg_bootstrap_ci(spark, SF).collect()[0]
    b = agg_bootstrap_ci(spark, SF).collect()[0]
    assert a == b


def test_psi_zero_on_identical_distributions(spark, tmp_path):
    """Write a synthetic orders table whose pre-1998 and post-1998
    windows carry the SAME value multiset — every bin's p equals q, so
    every PSI term (and the total) must be exactly zero."""
    from etl_neotel_sql_automation_spark.workload.wave12 import quality_psi_drift

    vals = [25_000.0, 75_000.0, 75_000.0, 125_000.0, 280_000.0] * 4
    rows = []
    for i, v in enumerate(vals):
        rows.append((i, 1, "O", v, datetime.datetime(1996, 3, 1), "1-URGENT"))
        rows.append(
            (1000 + i, 1, "O", v, datetime.datetime(1999, 3, 1), "1-URGENT")
        )
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = quality_psi_drift(spark, str(tmp_path)).collect()
    assert all(r["psi_term_micro"] == 0 for r in out)
    assert all(r["psi_total_micro"] == 0 for r in out)
    assert all(r["ref_cnt"] == r["cur_cnt"] for r in out)


def test_psi_terms_nonneg_and_shares_sum_to_one(spark):
    from etl_neotel_sql_automation_spark.workload.wave12 import quality_psi_drift

    out = quality_psi_drift(spark, SF).collect()
    assert all(r["psi_term_micro"] >= 0 for r in out)
    assert sum(r["psi_term_micro"] for r in out) == out[0]["psi_total_micro"]
    # smoothed ppm shares each sum to 1e6 up to floor-division loss
    for side in ("ref_ppm", "cur_ppm"):
        s = sum(r[side] for r in out)
        assert 1_000_000 - len(out) <= s <= 1_000_000


def test_kappa_is_one_under_perfect_agreement(spark, tmp_path):
    """A lineitem table with no orderkey divisible by 10 has an empty
    corruption set: rater B equals rater A everywhere, so kappa_ppm
    must be exactly 1_000_000 whatever the marginals."""
    from etl_neotel_sql_automation_spark.workload.wave12 import agg_cohens_kappa

    rows = [
        (11 + 10 * i, 1, 1, float(5 + i % 40), 100.0, "R" if i % 3 else "A")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_returnflag string",
    )
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    row = agg_cohens_kappa(spark, str(tmp_path)).collect()[0]
    assert row["po_ppm"] == 1_000_000
    assert row["kappa_ppm"] == 1_000_000


def test_kappa_matches_constructed_noise_rate(spark):
    """po_ppm is fully determined by the 10% corruption construction:
    exactly the rows with l_orderkey % 10 == 0 disagree."""
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave12 import agg_cohens_kappa

    li = table(spark, SF, "lineitem")
    n = li.count()
    d = li.filter(F.col("l_orderkey") % 10 == 0).count()
    row = agg_cohens_kappa(spark, SF).collect()[0]
    assert row["n_items"] == n
    assert row["po_ppm"] == (1_000_000 * (n - d)) // n
    assert 0 < row["kappa_ppm"] < 1_000_000


def test_calibration_ece_is_weighted_gap_mean(spark):
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave12 import (
        quality_calibration_bins,
    )

    out = quality_calibration_bins(spark, SF).collect()
    ndocs = table(spark, SF, "documents").count()
    assert sum(r["n"] for r in out) == ndocs
    want = sum(r["n"] * r["gap_ppm"] for r in out) // sum(r["n"] for r in out)
    assert all(r["ece_ppm"] == want for r in out)
    assert all(0 <= r["avg_score_ppm"] <= 1_000_000 for r in out)
    assert all(0 <= r["pos_rate_ppm"] <= 1_000_000 for r in out)


def test_info_gain_ranks_parity_last(spark):
    """doc_id parity is independent of language by construction — its
    gain must sit at the bottom and within rounding noise of zero,
    while the real features stay non-negative and >= parity."""
    from etl_neotel_sql_automation_spark.workload.wave12 import quality_info_gain

    out = quality_info_gain(spark, SF).collect()
    gains = {r["feature"]: r["info_gain_micro"] for r in out}
    assert set(gains) == {"source", "len_bucket", "doc_parity"}
    # per-term micro-nat rounding can leave a few-micro-nat residue
    assert abs(gains["doc_parity"]) < 2_000
    assert gains["source"] >= gains["doc_parity"] - 50
    assert gains["len_bucket"] >= gains["doc_parity"] - 50
    # ranking is descending by gain
    assert [r["info_gain_micro"] for r in out] == sorted(
        (r["info_gain_micro"] for r in out), reverse=True
    )
    # conditional entropy can never exceed the label entropy beyond
    # rounding residue
    assert all(r["h_cond_micro"] <= r["h_label_micro"] + 2_000 for r in out)
