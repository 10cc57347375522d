"""Fixture test for the wave-46 (round 8) split-conformal audit — a
constructed corpus whose split assignment, calibration subsample,
conformal rank, and coverage are all replayed independently in Python
(hashlib md5), so the k = ceil(0.9 (n+1)) rule, the milli-residual
arithmetic, and the <= q_hat coverage test are pinned by hand.
"""

from __future__ import annotations

import hashlib
import math


def _m(i: int, mod: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % mod


def _split(i: int) -> str:
    b = _m(i, 100)
    return "train" if b < 90 else ("eval" if b < 95 else "test")


def test_conformal_hand_replay(spark):
    from etl_neotel_sql_automation_spark.workload.wave46 import (
        _CB_CAL_MOD,
        conformal_bounds_frame,
    )

    # single source; n_chars = doc_id so every quantity is explicit
    ids = list(range(400))
    docs = spark.createDataFrame(
        [(i, "s0", i) for i in ids],
        "doc_id long, source string, n_chars long",
    )
    got = conformal_bounds_frame(docs).collect()
    assert len(got) == 1
    r = got[0]

    train = [i for i in ids if _split(i) == "train"]
    mean_milli = (1000 * sum(train)) // len(train)
    cal = sorted(
        (abs(i * 1000 - mean_milli), i)
        for i in ids
        if _split(i) == "eval" and _m(i, _CB_CAL_MOD) == 0
    )
    n_cal = len(cal)
    assert n_cal >= 2  # the subsample is genuinely non-trivial
    k = min(math.ceil(9 * (n_cal + 1) / 10), n_cal)
    q_hat = cal[k - 1][0]
    test = [i for i in ids if _split(i) == "test"]
    covered = sum(1 for i in test if abs(i * 1000 - mean_milli) <= q_hat)

    assert r["n_train"] == len(train)
    assert r["train_mean_milli"] == mean_milli
    assert r["n_cal"] == n_cal
    assert r["q_hat_milli"] == q_hat
    assert r["n_test"] == len(test)
    assert r["n_covered"] == covered
    assert r["coverage_ppm"] == (1_000_000 * covered) // len(test)
    assert r["pooled_coverage_ppm"] == r["coverage_ppm"]
