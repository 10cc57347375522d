"""Fixture tests for the wave-28 (round 6) workload — semantics the
oracle differential cannot pin: identical docs land in bucket 9 and
are ALWAYS flagged (any band of equal signatures collides); the
analytic column replays the closed form exactly; bucket assignment
honors the round-6 Jaccard convention on a constructed overlap.
"""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _analytic(bucket: int) -> int:
    s = (bucket + 0.5) / 10.0
    return round((1.0 - (1.0 - s**4) ** 8) * 1e6)


def test_s_curve_identical_docs_always_flagged(spark, tmp_path):
    """Three identical docs: all 3 pairs have J = 1.0 (bucket 9) and
    every pair is flagged (equal signatures collide in every band)."""
    from etl_neotel_sql_automation_spark.workload.wave28 import (
        dedup_minhash_s_curve,
    )

    text = " ".join(f"w{i}" for i in range(30))
    rows = [(i, text, "en", "s") for i in range(3)]
    # a fourth doc sharing nothing (no co-shingle pair at all)
    rows.append((9, " ".join(f"z{i}" for i in range(30)), "en", "s"))
    out = dedup_minhash_s_curve(spark, _docs(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 9
    assert r["n_pairs"] == 3 and r["n_flagged"] == 3
    assert r["measured_ppm"] == 1_000_000
    assert r["analytic_ppm"] == _analytic(9)


def test_s_curve_bucketing_of_constructed_overlap(spark, tmp_path):
    """Two docs sharing exactly half their shingle sets: 30-token docs
    with the last 15 tokens shared -> intersection 13 shingles of
    28+28 -> J = 13/43 ~= 0.302 -> bucket 3, and the analytic column
    carries the closed form for bucket 3."""
    from etl_neotel_sql_automation_spark.workload.wave28 import (
        dedup_minhash_s_curve,
    )

    shared = " ".join(f"c{i}" for i in range(15))
    a = " ".join(f"a{i}" for i in range(15)) + " " + shared
    b = " ".join(f"b{i}" for i in range(15)) + " " + shared
    rows = [(0, a, "en", "s"), (1, b, "en", "s")]
    out = dedup_minhash_s_curve(spark, _docs(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # 28 shingles each; shared run of 15 tokens gives 13 shared shingles
    j = 13 / (28 + 28 - 13)
    assert r["bucket"] == math.floor(round(j, 6) * 10)
    assert r["n_pairs"] == 1
    assert r["analytic_ppm"] == _analytic(r["bucket"])


def test_s_curve_real_corpus_tracks_theory_at_extremes(spark):
    """On the corpus: the bottom bucket's measured collision rate must
    sit at/below ~the analytic near-zero rate, and the top bucket's at
    ~1e6 — the sketch working as designed where it matters."""
    from etl_neotel_sql_automation_spark.workload.wave28 import (
        dedup_minhash_s_curve,
    )

    out = {r["bucket"]: r for r in dedup_minhash_s_curve(spark, SF).collect()}
    assert 0 in out and 9 in out
    assert out[0]["measured_ppm"] <= 5_000  # theory says 50 ppm at mid
    assert out[9]["measured_ppm"] >= 990_000
