"""Fixture test for the wave-64 (round 8) Heaps'-law curve — an
8-doc corpus (one doc per segment) whose cumulative token/vocab
counts are enumerated by hand and whose log-log fit is replayed with
an independent Python-int reference on identically quantized logs.
"""

from __future__ import annotations

import math


def test_heaps_curve_and_fit_replayed(spark):
    from etl_neotel_sql_automation_spark.workload.wave64 import heaps_frame

    texts = [
        "a b",            # vocab {a,b}
        "a c",            # +c
        "a b c d",        # +d
        "d e",            # +e
        "a e f g",        # +f,g
        "g h",            # +h
        "a b h i",        # +i
        "i j",            # +j
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    got = {r["seg"]: r for r in heaps_frame(docs).collect()}
    assert sorted(got) == list(range(1, 9))
    ntoks = [2, 2, 4, 2, 4, 2, 4, 2]
    vocab_new = [2, 1, 1, 1, 2, 1, 1, 1]
    tokens_cum = vocab_cum = 0
    xs, ys = [], []
    for seg in range(1, 9):
        tokens_cum += ntoks[seg - 1]
        vocab_cum += vocab_new[seg - 1]
        r = got[seg]
        assert r["docs_cum"] == seg
        assert r["tokens_cum"] == tokens_cum
        assert r["vocab_cum"] == vocab_cum
        xs.append(round(math.log(tokens_cum) * 1e6))
        ys.append(round(math.log(vocab_cum) * 1e6))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    det = n * sum(v * v for v in xs) - sx * sx
    cov = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    slope = float(cov) / float(det)
    for seg in range(1, 9):
        assert got[seg]["heaps_beta"] == round(slope, 6)
        assert got[seg]["heaps_lnk"] == round((sy - slope * sx) / (n * 1e6), 6)
    # a growing vocabulary with sublinear growth: 0 < beta < 1
    assert 0.0 < got[1]["heaps_beta"] < 1.0
