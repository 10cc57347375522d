"""Fixture tests for the wave-32 (round 7) workloads — semantics the
oracle differential cannot see because both engines share the
formulas: the Murphy decomposition is pinned on hand-built
distributions where each term has a closed form, and the charset
ratios on strings whose class counts are countable by eye.
"""

from __future__ import annotations


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_brier_perfect_forecast_decomposes_to_zero(spark, tmp_path):
    """Forecast 0 on label-0 docs and ~1e6 on label-1 docs: Brier ~ 0,
    REL ~ 0, and RES ~ UNC (sharp, calibrated). Label-1 docs are all
    stopwords (score 1e6, >=30 tokens); label-0 docs have no stopwords
    and <30 tokens (score 0)."""
    from etl_neotel_sql_automation_spark.workload.wave32 import (
        quality_brier_decomposition,
    )

    all_stop = " ".join(["the"] * 40)  # score 1e6, pos 1
    no_stop = "quick brown fox jumps"  # score 0, pos 0
    rows = [(i, all_stop, "en", "s", 1) for i in range(10)]
    rows += [(100 + i, no_stop, "en", "s", 1) for i in range(30)]
    r = quality_brier_decomposition(spark, _docs(spark, tmp_path, rows))
    row = r.collect()[0]
    assert row["n_docs"] == 40
    assert row["brier_ppm2"] == 0 and row["rel_ppm2"] == 0
    # obar = 250000 ppm -> unc = 250000 * 750000; resolution equals
    # uncertainty exactly for a perfectly sharp calibrated forecast
    assert row["unc_ppm2"] == 250_000 * 750_000
    assert row["res_ppm2"] == row["unc_ppm2"]
    assert row["wbv_ppm2"] == 0


def test_brier_constant_forecast_has_zero_resolution(spark, tmp_path):
    """A constant mid-scale forecast on a mixed population: RES = 0
    (no sharpness), REL = (pbar - obar)^2, Brier = REL + UNC, and the
    within-bin variance term is exactly zero because the forecast is
    bin-constant. 3 of 4 docs positive, all scores 500000 ppm (half
    stopwords; one token-count flips the label)."""
    from etl_neotel_sql_automation_spark.workload.wave32 import (
        quality_brier_decomposition,
    )

    # 16 'the' + 16 rare words -> score 500000 ppm, 32 tokens -> pos 1
    long_half = " ".join(["the"] * 16 + ["zq"] * 16)
    # 2 'the' + 2 rare -> score 500000 ppm, 4 tokens -> pos 0
    short_half = "the zq the zq"
    rows = [(i, long_half, "en", "s", 1) for i in range(3)]
    rows.append((99, short_half, "en", "s", 1))
    row = quality_brier_decomposition(
        spark, _docs(spark, tmp_path, rows)
    ).collect()[0]
    assert row["n_docs"] == 4
    assert row["res_ppm2"] == 0
    # obar = 750000; pbar = 500000 -> REL = 250000^2
    assert row["rel_ppm2"] == 250_000 * 250_000
    assert row["unc_ppm2"] == 750_000 * 250_000
    # per-doc (score - label)^2: 3x(500000)^2 + 1x(500000)^2 = 500000^2
    assert row["brier_ppm2"] == 500_000 * 500_000
    # identity holds exactly: brier = rel - res + unc, so wbv = 0
    assert row["wbv_ppm2"] == 0


def test_charset_profile_hand_counted(spark, tmp_path):
    """'AB cd 12 é!' per class: 11 chars, 10 printable-ASCII
    (all but the e-acute), 2 digits, 4 letters, 2 uppercase,
    3 spaces."""
    from etl_neotel_sql_automation_spark.workload.wave32 import (
        text_charset_profile,
    )

    rows = [(0, "AB cd 12 é!", "en", "s0", 1)]
    row = text_charset_profile(spark, _docs(spark, tmp_path, rows)).collect()[
        0
    ]
    assert row["total_chars"] == 11
    assert row["ascii_ppm"] == (1_000_000 * 10) // 11
    assert row["digit_ppm"] == (1_000_000 * 2) // 11
    assert row["alpha_ppm"] == (1_000_000 * 4) // 11
    assert row["upper_ppm"] == (1_000_000 * 2) // 11
    assert row["space_ppm"] == (1_000_000 * 3) // 11


def test_charset_profile_empty_text_guard(spark, tmp_path):
    """Empty documents must produce zero ratios, not a divide error."""
    from etl_neotel_sql_automation_spark.workload.wave32 import (
        text_charset_profile,
    )

    rows = [(0, "", "en", "s0", 0), (1, "", "en", "s0", 0)]
    row = text_charset_profile(spark, _docs(spark, tmp_path, rows)).collect()[
        0
    ]
    assert row["n_docs"] == 2 and row["total_chars"] == 0
    assert row["ascii_ppm"] == 0 and row["space_ppm"] == 0
