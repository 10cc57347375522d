"""Fixture tests for the wave-76 (round 9) frequency-domain and
pHash-sweep meters."""

from __future__ import annotations


def test_spectral_peaks_finds_planted_weekly_cadence(spark):
    from pyspark.sql import functions as F

    from etl_neotel_sql_automation_spark.workload.wave76 import (
        spectral_peaks_frame,
    )

    # 70 days; days where d % 7 == 0 carry 20 orders, others 1 — a
    # hard weekly cadence and no monthly structure
    days = spark.range(0, 70).select(F.col("id").alias("d"))
    orders = (
        days.select(
            "d",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.when(F.col("d") % 7 == 0, 20).otherwise(1),
                )
            ).alias("i"),
        )
        .select(
            F.expr("date_add(DATE '1992-01-01', CAST(d AS INT))").alias(
                "o_orderdate"
            )
        )
    )
    rows = {r["period"]: r for r in spectral_peaks_frame(orders).collect()}
    assert rows[7]["n_days"] == 70 and rows[7]["n_orders"] == 260
    assert rows[7]["power_per_day2"] > 10 * rows[30]["power_per_day2"]


def test_phash_sweep_is_monotone_and_catches_exact_dups(spark):
    from etl_neotel_sql_automation_spark.workload.wave76 import (
        phash_threshold_sweep_frame,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    assert len(base) >= 60
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate([base, base, "q" * 60])],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = sorted(
        phash_threshold_sweep_frame(docs).collect(), key=lambda r: r["radius"]
    )
    counts = [r["n_pairs"] for r in rows]
    assert len(counts) == 11
    assert counts[0] >= 1  # the exact dup pair collides at radius 0
    assert all(a <= b for a, b in zip(counts, counts[1:]))  # monotone
