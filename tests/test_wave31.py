"""Fixture tests for the wave-31 (round 7) rank-metric layer —
semantics the oracle differential cannot pin because both engines run
the same formulas: the MRR/NDCG/AP arithmetic is checked against a
hand-computed ranking, and the perfect-retrieval identity is checked
end-to-end through the real binary-rerank path.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _positions(spark, rows):
    """(qid, rnk, rel, hit, rr_rank) rows -> positions frame with the
    hits_at running count the metric layer expects."""
    from pyspark.sql import Window as W

    met = spark.createDataFrame(
        rows, "qid long, rnk int, rel long, hit long, rr_rank int"
    )
    wc = W.partitionBy("qid").orderBy("rnk")
    return met.withColumn("hits_at", F.sum("hit").over(wc))


def test_rank_metrics_hand_computed(spark):
    """One query, k=10, hits at ranks 1/3/4 with exact ranks 1/2/10:
    rels 10/9/1. Expected values computed here independently with
    float log2 + the same integer roundings the engine bakes in."""
    from etl_neotel_sql_automation_spark.workload.wave31 import (
        _IDCG,
        _INVD,
        metrics_over_positions,
    )

    rows = []
    for rnk in range(1, 11):
        rel = {1: 10, 3: 9, 4: 1}.get(rnk, 0)
        rows.append((0, rnk, rel, 1 if rel else 0, rnk if rel == 10 else None))
    r = metrics_over_positions(_positions(spark, rows), 1).collect()[0]

    # MRR: the true #1 sits at rank 1
    assert r["rr_ppm"] == 1_000_000
    # NDCG: dcg = 10*invd[1] + 9*invd[3] + 1*invd[4]
    dcg = 10 * _INVD[0] + 9 * _INVD[2] + 1 * _INVD[3]
    assert r["ndcg_ppm"] == (1_000_000 * dcg) // _IDCG
    # independent recomputation of the discount constants
    assert _INVD[0] == 1_000_000_000
    assert _INVD[2] == round(1e9 / math.log2(4)) == 500_000_000
    # AP@10: precision at hit ranks = 1/1, 2/3, 3/4
    ap = (1_000_000 * (1 * 2520 + 2 * (2520 // 3) + 3 * (2520 // 4))) // (
        2520 * 10
    )
    assert r["ap_ppm"] == ap == int(1e6 * (1 + 2 / 3 + 3 / 4) / 10)
    # single query: pooled means equal the per-query values
    assert r["mean_rr_ppm"] == r["rr_ppm"]
    assert r["mean_ndcg_ppm"] == r["ndcg_ppm"]
    assert r["map_ppm"] == r["ap_ppm"]


def test_rank_metrics_miss_scores_zero(spark):
    """A ranking with zero overlap must score 0 on all three metrics
    (and MRR must not throw on the all-null rr_rank group)."""
    from etl_neotel_sql_automation_spark.workload.wave31 import (
        metrics_over_positions,
    )

    rows = [(0, rnk, 0, 0, None) for rnk in range(1, 11)]
    r = metrics_over_positions(_positions(spark, rows), 1).collect()[0]
    assert r["rr_ppm"] == 0 and r["ndcg_ppm"] == 0 and r["ap_ppm"] == 0


def test_rerank_metrics_perfect_on_small_corpus(spark):
    """With the corpus smaller than the Hamming candidate pool the
    rerank IS brute force, so every metric must hit the identity:
    rr = ndcg = ap = 1e6 per query, precision@i = 1e6, and
    recall@i = i/k — end-to-end through the real path at sf0.001."""
    from etl_neotel_sql_automation_spark.workload.wave31 import (
        _BH_K,
        emb_rerank_pr_curve,
        emb_rerank_rank_metrics,
    )

    sf = "/root/testdata/sf0.001"
    n_corpus = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .filter("vec_id >= 5")
        .count()
    )
    if n_corpus > 500:  # candidate pool no longer covers the corpus
        import pytest

        pytest.skip("sf0.001 corpus larger than the candidate pool")
    for r in emb_rerank_rank_metrics(spark, sf).collect():
        assert r["rr_ppm"] == 1_000_000
        assert r["ndcg_ppm"] == 1_000_000
        assert r["ap_ppm"] == 1_000_000
    for r in emb_rerank_pr_curve(spark, sf).collect():
        assert r["precision_ppm"] == 1_000_000
        assert (
            r["recall_ppm"] == (1_000_000 * r["cutoff"]) // _BH_K
        )


def test_sampled_emb_matches_independent_md5(spark):
    """The r8 sampled twins' population: sampled_emb must keep every
    query id (vec_id < 5) and exactly the corpus ids whose md5 prefix
    is 0 mod 4 — checked against an independent hashlib.md5
    recomputation of the 15-hex-digit prefix arithmetic, so a drift in
    either engine's predicate (conv base, substring offset, modulus)
    breaks here rather than silently shrinking the meter's sample."""
    import hashlib

    from etl_neotel_sql_automation_spark.workload.wave31 import (
        _RRM_SAMPLE_MOD,
        sampled_emb,
    )

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    got = sorted(r["vec_id"] for r in sampled_emb(emb).collect())
    want = sorted(
        i
        for i in range(200)
        if i < 5
        or int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        % _RRM_SAMPLE_MOD
        == 0
    )
    assert got == want
    assert 5 < len(want) < 200  # queries kept, corpus genuinely sampled


def test_sampled_metric_is_exact_metric_on_sample(spark):
    """Semantics pin: the sampled twin IS the full meter run on the
    sampled population — rank_metrics_sampled_frame(emb) must equal
    rank_metrics_frame(sampled_emb(emb)) row for row (the unbiased-
    estimate claim rests on both legs seeing the identical sampled
    corpus; any leg sampling independently would break this)."""
    from etl_neotel_sql_automation_spark.workload.wave31 import (
        rank_metrics_frame,
        rank_metrics_sampled_frame,
        sampled_emb,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = rank_metrics_sampled_frame(emb).collect()
    want = rank_metrics_frame(sampled_emb(emb)).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 5
