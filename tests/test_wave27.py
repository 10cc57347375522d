"""Fixture tests for the wave-27 (round 6) workloads — semantics the
oracle differential cannot pin: the contrastive-pair invariants
(positives share the anchor's source and wrap correctly; negatives
never share it; singleton sources never anchor; every >=2-doc source
doc anchors exactly once), and the rolling median's defining
robustness (one planted outlier day moves the 7-day mean but leaves
the median exactly fixed).
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_contrastive_pair_invariants(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave27 import (
        train_contrastive_pairs,
    )

    rows = [
        (1, "a", "en", "s1"),
        (2, "b", "en", "s1"),
        (3, "c", "en", "s1"),
        (4, "d", "en", "s2"),
        (5, "e", "en", "s2"),
        (6, "f", "en", "lonely"),  # singleton source: never an anchor
    ]
    src = {r[0]: r[3] for r in rows}
    out = train_contrastive_pairs(spark, _docs(spark, tmp_path, rows)).collect()
    anchors = {r["anchor_id"] for r in out}
    assert anchors == {1, 2, 3, 4, 5}
    for r in out:
        assert src[r["pos_id"]] == src[r["anchor_id"]]
        assert r["pos_id"] != r["anchor_id"]
        if r["neg_id"] is not None:
            assert src[r["neg_id"]] != src[r["anchor_id"]]
            assert r["neg_miss"] == 0
    # wrap: doc 3 (last of s1) pairs with doc 1 (first of s1)
    by_anchor = {r["anchor_id"]: r for r in out}
    assert by_anchor[3]["pos_id"] == 1
    assert by_anchor[5]["pos_id"] == 4


def test_contrastive_pairs_cover_real_corpus(spark):
    from etl_neotel_sql_automation_spark.workload.wave27 import (
        train_contrastive_pairs,
    )

    out = train_contrastive_pairs(spark, SF).collect()
    assert len(out) > 0
    # on a 20-source corpus the 2-step ring lookahead should almost
    # never miss; assert misses stay exceptional
    misses = sum(r["neg_miss"] for r in out)
    assert misses <= max(1, len(out) // 100)


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_rolling_median_ignores_planted_outlier(spark, tmp_path):
    """$100/day for 15 days with one $10000 day in the middle: every
    full frame containing the outlier keeps median exactly 10000 cents
    while its mean jumps; frames without it read 10000/10000."""
    from etl_neotel_sql_automation_spark.workload.wave27 import (
        timeseries_rolling_median,
    )

    base = datetime.date(1996, 1, 1)
    rows = []
    for i in range(15):
        v = 10_000.0 if i == 7 else 100.0
        rows.append(
            (i, 1, v,
             datetime.datetime.combine(base + datetime.timedelta(days=i),
                                       datetime.time(12)), "x")
        )
    out = {r["day"]: r for r in timeseries_rolling_median(
        spark, _orders(spark, tmp_path, rows)).collect()}
    assert len(out) == 9  # days 4..12 have full frames
    for day, r in out.items():
        assert r["median7_cents"] == 10_000  # the $100 day in cents
        i = (day - base).days
        if 4 <= i <= 10:  # frame contains the outlier day 7
            assert r["mean7_cents"] == (6 * 10_000 + 1_000_000) // 7
        else:
            assert r["mean7_cents"] == 10_000
