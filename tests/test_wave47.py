"""Fixture test for the wave-47 (round 8) cluster-routed split — the
wave-43 planted-leak corpus run through the FIX: the eval near-dup of
a train document must be ROUTED to train (moved off its naive split),
and the post-routing cross-split pair count must be zero.
"""

from __future__ import annotations

import hashlib


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100


def _split(i: int) -> str:
    b = _bucket(i)
    return "train" if b < 90 else ("eval" if b < 95 else "test")


def test_routing_closes_the_planted_leak(spark):
    from etl_neotel_sql_automation_spark.workload.wave47 import (
        split_cluster_routing_frame,
    )

    train_ids = [i for i in range(200) if _split(i) == "train"]
    eval_ids = [i for i in range(200) if _split(i) == "eval"]
    t0, e0 = train_ids[0], eval_ids[0]
    rep = min(t0, e0)  # the cluster representative (min doc id)
    dup = "alpha beta gamma delta epsilon zeta"
    rows = [
        (t0, dup),  # the leak pair from the wave-43 fixture
        (e0, dup),
        (train_ids[1], "red orange yellow green blue indigo"),
        (eval_ids[1], "north south east west up down"),
    ]
    got = {
        r["split"]: r
        for r in split_cluster_routing_frame(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    # the pair's two docs both route to the representative's split
    rep_split = _split(rep)
    moved_doc_split = _split(max(t0, e0))
    assert rep_split != moved_doc_split  # the pair genuinely straddled
    assert got[rep_split]["n_docs_moved"] == 1  # one doc pulled over
    total = sum(r["n_docs"] for r in got.values())
    assert total == 4
    for r in got.values():
        assert r["cross_pairs_after"] == 0
        assert r["moved_share_ppm"] == 1_000_000 // 4
    # singletons keep their naive split
    assert got["eval"]["n_docs"] == 1  # eval_ids[1] only
