"""Fixture tests for the wave-43 (round 8) split leakage audit — a
constructed corpus where a known near-dup pair straddles train/eval
(doc ids CHOSEN by replaying the md5 bucket arithmetic in Python), and
the expected-share table re-derived by hand.
"""

from __future__ import annotations

import hashlib


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100


def _split(i: int) -> str:
    b = _bucket(i)
    return "train" if b < 90 else ("eval" if b < 95 else "test")


def test_expected_ppm_table():
    from etl_neotel_sql_automation_spark.workload.wave43 import (
        _EXPECTED_PPM,
    )

    assert _EXPECTED_PPM[("train", "train")] == 810_000
    assert _EXPECTED_PPM[("eval", "train")] == 90_000
    assert _EXPECTED_PPM[("test", "train")] == 90_000
    assert _EXPECTED_PPM[("eval", "eval")] == 2_500
    assert _EXPECTED_PPM[("test", "test")] == 2_500
    assert _EXPECTED_PPM[("eval", "test")] == 5_000
    assert sum(_EXPECTED_PPM.values()) == 1_000_000


def test_leakage_detects_planted_cross_split_dup(spark):
    """Plant one exact-dup pair straddling train/eval and one inside
    train: the audit must report exactly one cross row (is_cross 1)
    and one diagonal row, with pooled cross_ppm = 500000."""
    from etl_neotel_sql_automation_spark.workload.wave43 import (
        split_leakage_frame,
    )

    train_ids = [i for i in range(200) if _split(i) == "train"]
    eval_ids = [i for i in range(200) if _split(i) == "eval"]
    assert len(train_ids) >= 3 and len(eval_ids) >= 1

    dup_a = "alpha beta gamma delta epsilon zeta"
    dup_b = "one two three four five six seven"
    # fillers share no shingle with the dups or each other
    fillers = [
        "red orange yellow green blue indigo",
        "north south east west up down",
    ]
    rows = [
        (train_ids[0], dup_a),  # train half of the leak pair
        (eval_ids[0], dup_a),   # eval half
        (train_ids[1], dup_b),  # train-train dup pair
        (train_ids[2], dup_b),
        (train_ids[0] + 0, fillers[0]),  # placeholder replaced below
    ]
    # unique filler docs on fresh ids (keep every doc_id distinct)
    used = {r[0] for r in rows[:4]}
    free = [i for i in range(200) if i not in used]
    rows = rows[:4] + [
        (free[0], fillers[0]),
        (free[1], fillers[1]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["split_lo"], r["split_hi"]): r
        for r in split_leakage_frame(docs).collect()
    }
    assert set(got) == {("eval", "train"), ("train", "train")}
    leak = got[("eval", "train")]
    diag = got[("train", "train")]
    assert leak["n_pairs"] == 1 and leak["is_cross"] == 1
    assert diag["n_pairs"] == 1 and diag["is_cross"] == 0
    assert leak["total_pairs"] == 2
    assert leak["cross_ppm"] == 500_000
    assert leak["share_ppm"] == 500_000
    assert leak["expected_ppm"] == 90_000
