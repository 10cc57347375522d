"""Fixture tests for the wave-44 (round 8) dedup threshold sweep —
the sweep layer is pinned on hand-bucketed pairs (reverse-cumulative
identities, keep-lowest removal, bucket edges), and the composed
pipeline on a corpus whose only candidate pair is a certain one (an
exact duplicate: every MinHash band matches regardless of hashes).
"""

from __future__ import annotations


def test_sweep_layer_hand_buckets(spark):
    from etl_neotel_sql_automation_spark.workload.wave44 import (
        sweep_over_scored,
    )

    # doc 2: two pairs at bucket 6 (max 6); doc 3: one pair at bucket
    # 10, one at 6 (max 10) — four pairs over a 4-doc corpus
    scored = spark.createDataFrame(
        [(2, 6), (2, 6), (3, 10), (3, 6)], "id_b long, bkt long"
    )
    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(4)], "doc_id long, text string"
    )
    rows = {
        r["threshold_ppm"]: r
        for r in sweep_over_scored(scored, docs).collect()
    }
    assert sorted(rows) == [k * 100_000 for k in range(1, 10)]
    for t, r in rows.items():
        if t <= 600_000:
            assert r["n_pairs_ge"] == 4
            assert r["n_docs_removed"] == 2
            assert r["n_docs_kept"] == 2
            assert r["removed_share_ppm"] == 500_000
        else:
            # only the bucket-10 pair survives; only doc 3 removed
            assert r["n_pairs_ge"] == 1
            assert r["n_docs_removed"] == 1
            assert r["n_docs_kept"] == 3
            assert r["removed_share_ppm"] == 250_000
    pairs = [rows[k * 100_000]["n_pairs_ge"] for k in range(1, 10)]
    assert pairs == sorted(pairs, reverse=True)


def test_sweep_e2e_exact_dup_cluster(spark):
    """Exact duplicates are CERTAIN LSH candidates (identical shingle
    sets -> identical signatures -> every band matches), so the
    composed pipeline's output is fully determined by hand: one pair
    at Jaccard 1.0, doc 2 removed at every threshold."""
    from etl_neotel_sql_automation_spark.workload.wave44 import (
        dedup_threshold_sweep_frame,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    rows = dedup_threshold_sweep_frame(docs).collect()
    assert len(rows) == 9
    for r in rows:
        assert r["n_pairs_ge"] == 1
        assert r["n_docs_removed"] == 1
        assert r["n_docs_kept"] == 2
        assert r["removed_share_ppm"] == 333_333
