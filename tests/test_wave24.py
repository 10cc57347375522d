"""Fixture tests for the wave-24 (round 6) workloads — semantics the
oracle differential cannot pin: the recall meters hit exactly 1e6 ppm
when the binary ranking provably preserves the cosine ranking (scaled
one-hot-ish vectors), the rerank path dominates the direct path on
real data (the whole reason it exists), and the Pareto/NBD statistics
on a hand-built purchase history including the one-order customer
(frequency 0, recency 0).
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def _emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_binary_quality_perfect_when_signs_separate(spark, tmp_path):
    """Corpus vectors live in orthogonal sign orthants, query matches
    one orthant exactly: Hamming and cosine agree on the full ranking
    -> both meters read 1e6 ppm."""
    from etl_neotel_sql_automation_spark.workload.wave24 import (
        emb_binary_quality,
        emb_binary_rerank_quality,
    )

    def orthant(k):
        # distinct sign patterns, one flipped block of 8 dims per k
        return [(-1.0 if (i // 8) < k else 1.0) for i in range(64)]

    rows = [(qid, orthant(0), 0) for qid in range(5)]
    rows += [(5 + j, orthant(j), 0) for j in range(8)]
    # pad corpus past k=10 with far vectors (all negative)
    rows += [(20 + j, [-1.0] * 64, 0) for j in range(4)]
    sf = _emb(spark, tmp_path, rows)
    direct = emb_binary_quality(spark, sf).collect()
    rerank = emb_binary_rerank_quality(spark, sf).collect()
    assert all(r["recall_ppm"] == 1_000_000 for r in direct)
    assert all(r["recall_ppm"] == 1_000_000 for r in rerank)


def test_rerank_dominates_direct_on_real_data(spark):
    """The deployment claim: exact rerank of Hamming candidates never
    loses to the raw Hamming ranking, and on this corpus strictly
    beats it."""
    from etl_neotel_sql_automation_spark.workload.wave24 import (
        emb_binary_quality,
        emb_binary_rerank_quality,
    )

    direct = emb_binary_quality(spark, SF).collect()[0]["recall_ppm"]
    rerank = emb_binary_rerank_quality(spark, SF).collect()[0]["recall_ppm"]
    assert rerank > direct


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_pareto_nbd_hand_built(spark, tmp_path):
    """Cust 1 orders on days 0/10/30 (freq 2, recency 30, T = 40 to
    the corpus end set by cust 2's day-40 order); cust 2 orders once
    on day 40 (freq 0, recency 0, T 0)."""
    from etl_neotel_sql_automation_spark.workload.wave24 import (
        orders_pareto_nbd_inputs,
    )

    d0 = datetime.datetime(1996, 1, 1)

    def at(days):
        return d0 + datetime.timedelta(days=days)

    rows = [
        (1, 1, 10.0, at(0), "x"),
        (2, 1, 10.0, at(10), "x"),
        (3, 1, 10.0, at(30), "x"),
        (4, 2, 10.0, at(40), "x"),
    ]
    out = {r["custkey"]: r for r in
           orders_pareto_nbd_inputs(spark, _orders(spark, tmp_path, rows)).collect()}
    assert out[1]["frequency"] == 2
    assert out[1]["recency_days"] == 30
    assert out[1]["t_days"] == 40
    assert out[2]["frequency"] == 0
    assert out[2]["recency_days"] == 0
    assert out[2]["t_days"] == 0
