"""Fixture test for the wave-66 (round 8) term dispersion — a 4-doc
corpus of equal lengths with one perfectly even term (DP = 0, VMR = 0)
and one fully concentrated term (DP = 0.75, VMR = 3), replayed by
hand including the zero-cell closed form.
"""

from __future__ import annotations


def test_dispersion_replayed_by_hand(spark):
    from etl_neotel_sql_automation_spark.workload.wave66 import (
        dispersion_frame,
    )

    texts = [
        "x z z z",
        "x a b c",
        "x a b c",
        "x a b c",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    got = {r["term"]: r for r in dispersion_frame(docs).collect()}
    assert sorted(got) == ["a", "b", "c", "x", "z"]
    # x: one occurrence per doc, equal doc sizes -> perfectly even
    assert got["x"]["df"] == 4 and got["x"]["c_tot"] == 4
    assert got["x"]["dp_ppm"] == 0
    assert got["x"]["burstiness_vmr"] == 0.0
    # z: all 3 occurrences in doc 0 ->
    # DP = 0.5 * (|1 - 1/4| + 3 * 1/4) = 0.75
    assert got["z"]["df"] == 1 and got["z"]["c_tot"] == 3
    assert got["z"]["dp_ppm"] == 750_000
    # counts (3,0,0,0): var = (9 - 9/4)/3 = 2.25, mean 0.75 -> VMR 3
    assert got["z"]["burstiness_vmr"] == 3.0
    # a: docs 1-3 only -> DP = 0.5*(1/4 + 3*(1/3 - 1/4)) = 0.25
    assert got["a"]["dp_ppm"] == 250_000
    # output ordering: df desc, then count, then term
    order = [r["term"] for r in dispersion_frame(docs).collect()]
    assert order == ["x", "a", "b", "c", "z"]
