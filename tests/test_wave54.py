"""Fixture tests for the wave-54 (round 8) isotonic calibration — a
constructed reliability diagram with a monotonicity violation whose
PAV pooling is replayed by hand, and an already-monotone diagram that
must pass through unchanged.
"""

from __future__ import annotations

STOP = "the of and"  # 3 stopwords from the house list


def _doc(n_plain: int, stop_words: str = "") -> str:
    words = [f"w{i}" for i in range(n_plain)]
    if stop_words:
        words += stop_words.split()
    return " ".join(words)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_pav_pools_the_violation(spark):
    from etl_neotel_sql_automation_spark.workload.wave54 import isotonic_frame

    texts = [
        # bin0: 30 tokens, 0 stopwords -> ratio 0, pos=1 -> rate 1.0
        _doc(30),
        # bin1: 20 tokens, 3 stopwords -> ratio 0.15, pos=0 -> rate 0.0
        _doc(17, STOP),
        # bin2: 40 tokens, 10 stopwords -> ratio 0.25, pos=1 (x2)
        _doc(30, "the of and to in is it a an the"),
        _doc(30, "the of and to in is it a an the"),
    ]
    rows = {r["bin"]: r for r in isotonic_frame(_docs(spark, texts)).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[0]["raw_rate_ppm"] == 1_000_000
    assert rows[1]["raw_rate_ppm"] == 0
    assert rows[2]["raw_rate_ppm"] == 1_000_000
    # PAV: (1.0, 0.0) violates increasing order -> pool to 1/2; bin2
    # stays at 1.0 (>= 0.5). Minimax replay for bin0:
    #   max over j<=0 of min over k>=0 of mean(j..k)
    #   = min(1/1, 1/2, 3/4) = 1/2
    assert rows[0]["iso_rate"] == 0.5
    assert rows[1]["iso_rate"] == 0.5
    assert rows[2]["iso_rate"] == 1.0


def test_pav_keeps_monotone_input(spark):
    from etl_neotel_sql_automation_spark.workload.wave54 import isotonic_frame

    texts = [
        # bin0: two docs, one pos -> rate 0.5
        _doc(30),
        _doc(25),
        # bin2: two docs, both pos -> rate 1.0
        _doc(30, "the of and to in is it a an the"),
        _doc(30, "the of and to in is it a an the"),
    ]
    rows = {r["bin"]: r for r in isotonic_frame(_docs(spark, texts)).collect()}
    assert rows[0]["iso_rate"] == 0.5 and rows[0]["n"] == 2
    assert rows[2]["iso_rate"] == 1.0 and rows[2]["n_pos"] == 2
