"""Fixture tests for the wave-74 (round 9) byte-level payload meters:
hand-computable payloads driven through the real mapInPandas plumbing.
"""

from __future__ import annotations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_byte_entropy_extremes(spark):
    from etl_neotel_sql_automation_spark.workload.wave74 import (
        byte_entropy_frame,
    )

    # constant payload -> H = 0; two equiprobable bytes -> H = ln 2
    rows = {
        r["doc_id"]: r
        for r in byte_entropy_frame(_docs(spark, ["aaaaaaaa", "abababab"])).collect()
    }
    assert rows[0]["entropy_micronat"] == 0
    assert rows[0]["n_distinct"] == 1
    # ln(2) = 0.693147...; per-term micro-nat rounding -> 693147
    assert rows[1]["entropy_micronat"] == 693147
    assert rows[1]["n_bytes"] == 8 and rows[1]["n_distinct"] == 2


def test_clipping_rate_hand_case(spark):
    from etl_neotel_sql_automation_spark.workload.wave74 import (
        clipping_rate_frame,
    )

    # 'z' (peak) x3, 'm' x5, 'a' (floor) x2 -> hi 300000 ppm, lo 200000
    [r] = clipping_rate_frame(_docs(spark, ["zzzmmmmmaa"])).collect()
    assert r["n_bytes"] == 10
    assert r["peak_byte"] == ord("z") and r["floor_byte"] == ord("a")
    assert r["clip_hi_ppm"] == 300000
    assert r["clip_lo_ppm"] == 200000


def test_silence_runs_hand_case(spark):
    from etl_neotel_sql_automation_spark.workload.wave74 import (
        silence_runs_frame,
    )

    # runs: 'aaaa'(4), 'b'(1), 'ccc'(3), 'd'(1), 'e'(1) -> 2 silence
    # runs (>=3) covering 7 of 10 bytes
    [r] = silence_runs_frame(_docs(spark, ["aaaabcccde"])).collect()
    assert r["n_bytes"] == 10
    assert r["max_run"] == 4
    assert r["n_silence_runs"] == 2
    assert r["silence_ppm"] == 700000
