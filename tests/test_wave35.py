"""Fixture tests for the wave-35 (round 7) JL distortion meter —
closed-form geometry the differential can't see: a ±1 sign matrix
preserves single-coordinate differences EXACTLY (every projected
coordinate moves by ±delta, so the ratio is exactly 1e6), two-
coordinate differences scale by the sign-row agreement count
(recomputed here independently from the sign matrix), and the
degenerate-pair filter.
"""

from __future__ import annotations


def _emb(spark, tmp_path, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_single_coordinate_difference_is_isometric(spark, tmp_path):
    """Pairs differing in one coordinate: d2_proj = k * d2_orig
    exactly, so every ratio is 1e6 and the concentration columns
    saturate."""
    from etl_neotel_sql_automation_spark.workload.wave35 import (
        emb_jl_distortion,
    )

    base = [0.25] * 64
    v1 = list(base)
    v1[7] += 0.5
    v2 = list(base)
    v2[40] -= 0.25
    r = emb_jl_distortion(
        spark, _emb(spark, tmp_path, [base, v1, v2])
    ).collect()[0]
    assert r["n_pairs"] == 3  # all three pairs differ in 1-2 coords
    # pairs (base,v1) and (base,v2) are single-coordinate: ratio 1e6.
    # pair (v1,v2) differs in two coordinates with different deltas —
    # still bounded within [0, 2e6] but not necessarily 1e6; check the
    # two exact ones via min/max bracketing the 1e6 midline
    assert r["min_ppm"] <= 1_000_000 <= r["max_ppm"]


def test_two_coordinate_ratio_matches_sign_agreement(spark, tmp_path):
    """v0 = 0, v1 = d*(e_i + e_j): projected diffs are qd*(s_i + s_j),
    so d2_proj = 4*agree*(qd)^2 where agree = #rows with s_i == s_j,
    and ratio = 1e6 * agree / 8 — recomputed here straight from the
    sign matrix."""
    from etl_neotel_sql_automation_spark.workload.wave35 import (
        _SIGNS,
        emb_jl_distortion,
    )

    i, jj = 3, 29
    agree = sum(1 for row in _SIGNS if row[i] == row[jj])
    v0 = [0.0] * 64
    v1 = [0.0] * 64
    v1[i] = 0.5
    v1[jj] = 0.5
    r = emb_jl_distortion(spark, _emb(spark, tmp_path, [v0, v1])).collect()[
        0
    ]
    assert r["n_pairs"] == 1
    assert r["mean_ppm"] == (1_000_000 * agree) // 8


def test_degenerate_pairs_filtered(spark, tmp_path):
    """Identical vectors (d2_orig = 0) and sub-milli differences are
    excluded from the ratio population, not divided by zero."""
    from etl_neotel_sql_automation_spark.workload.wave35 import (
        emb_jl_distortion,
    )

    a = [0.1] * 64
    b = list(a)  # identical
    c = list(a)
    c[0] += 0.5  # one real pair partner
    r = emb_jl_distortion(spark, _emb(spark, tmp_path, [a, b, c])).collect()[
        0
    ]
    # pairs: (a,b) excluded, (a,c) and (b,c) single-coordinate exact
    assert r["n_pairs"] == 2
    assert r["mean_ppm"] == 1_000_000
    assert r["within10_ppm"] == 1_000_000
