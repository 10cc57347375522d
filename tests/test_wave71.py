"""Fixture tests for the wave-71 (round 8) capture-recapture audit —
an identical-pair corpus where both occasions must catch everything
(coverage exactly 1e6, zero missed), and the estimator algebra
replayed by hand on the pair frame via the frame core's own capture
columns.
"""

from __future__ import annotations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_identical_pairs_fully_covered(spark):
    from etl_neotel_sql_automation_spark.workload.wave71 import (
        capture_recapture_frame,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",  # dup of 0
        "one two three four five six seven",
        "one two three four five six seven",  # dup of 2
        "red green blue yellow purple orange",
        "cat dog fish bird horse cow sheep goat",
    ]
    [r] = capture_recapture_frame(_docs(spark, texts)).collect()
    # identical texts share every band -> both occasions catch both
    # pairs; the unrelated docs are not 0.5-Jaccard duplicates
    assert r["n_caught"] == 2
    assert r["n1"] == 2 and r["n2"] == 2 and r["m_both"] == 2
    assert r["petersen_est"] == 2
    # chapman: 3*3 div 3 - 1 = 2
    assert r["chapman_est"] == 2
    assert r["est_missed"] == 0
    assert r["coverage_ppm"] == 1_000_000


def test_estimator_algebra_by_hand(spark):
    """Chapman/Petersen arithmetic on a hand capture table, driven
    through the same final aggregate by monkey-feeding the dup frame
    shape (cap_a, cap_b)."""
    from pyspark.sql import functions as F

    dup = spark.createDataFrame(
        [(1, 1)] * 4 + [(1, 0)] * 2 + [(0, 1)] * 3,
        "cap_a bigint, cap_b bigint",
    )
    t = dup.agg(
        F.count("*").cast("bigint").alias("n_caught"),
        F.coalesce(F.sum("cap_a"), F.lit(0)).cast("bigint").alias("n1"),
        F.coalesce(F.sum("cap_b"), F.lit(0)).cast("bigint").alias("n2"),
        F.coalesce(F.sum(F.col("cap_a") * F.col("cap_b")), F.lit(0))
        .cast("bigint")
        .alias("m_both"),
    )
    chap = "((n1 + 1) * (n2 + 1) div (m_both + 1) - 1)"
    [r] = t.select(
        "*",
        F.expr("CAST((n1 * n2) div m_both AS BIGINT)").alias("pet"),
        F.expr(f"CAST({chap} AS BIGINT)").alias("chapman"),
    ).collect()
    assert (r["n_caught"], r["n1"], r["n2"], r["m_both"]) == (9, 6, 7, 4)
    assert r["pet"] == (6 * 7) // 4  # 10
    assert r["chapman"] == (7 * 8) // 5 - 1  # 10
