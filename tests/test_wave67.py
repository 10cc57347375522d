"""Fixture test for the wave-67 (round 8) Rocchio feedback — a
15-vector corpus differentially checked against an independent numpy
reference that replays the whole loop (quantize, cosine/rank, exact
integer centroid sums, 40q+3s update, re-rank, overlap)."""

from __future__ import annotations

import numpy as np


def _rank(sims):
    # (n_id, sim) -> ranked list by sim desc, id asc
    return sorted(sims, key=lambda t: (-t[1], t[0]))


def _cos6(a, b):
    return round(float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b)), 6)


def test_rocchio_matches_numpy_reference(spark):
    from etl_neotel_sql_automation_spark.workload.wave67 import rocchio_frame

    rng = np.random.RandomState(7)
    vecs = rng.randn(15, 8).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(15)],
        "vec_id long, embedding array<float>, label int",
    )
    got = rocchio_frame(emb).collect()
    # queries are vec_id < 5
    q = {i: np.round(vecs[i].astype(np.float64) * 1e6) for i in range(5)}
    c = {i: np.round(vecs[i].astype(np.float64) * 1e6) for i in range(15)}
    by_q = {}
    for qid in range(5):
        sims = [(n, _cos6(q[qid], c[n])) for n in c if n != qid]
        top = _rank(sims)[:10]
        s = np.sum([c[n] for n, _ in top], axis=0)
        uv = 40.0 * q[qid] + 3.0 * s
        sims2 = [(n, _cos6(uv, c[n])) for n in c if n != qid]
        top2 = _rank(sims2)[:10]
        init_ids = {n for n, _ in top}
        by_q[qid] = (top2, init_ids)
    rows = {}
    for r in got:
        rows.setdefault(r["q_id"], []).append(r)
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for qid, (top2, init_ids) in by_q.items():
        rs = sorted(rows[qid], key=lambda r: r["rank"])
        assert len(rs) == 10
        overlap = sum(1 for n, _ in top2 if n in init_ids)
        for r, (n, sim) in zip(rs, top2):
            assert r["n_id"] == n
            assert r["sim"] == sim
            assert r["in_initial"] == (n in init_ids)
            assert r["overlap_at_10"] == overlap
