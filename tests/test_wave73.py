"""Fixture tests for the wave-73 (round 9) multimodal parity queries:
the dimension profile's bucket algebra on hand-built payloads, the
banding-recall meter's identity cases (exact dups are always caught;
recall is a genuine measurement at radius > bands-1), and the pHash
capture-recapture audit on an identical-pair corpus.
"""

from __future__ import annotations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_dim_profile_buckets(spark):
    from etl_neotel_sql_automation_spark.workload.wave73 import (
        dim_profile_frame,
    )

    # fake decoder: width = n_bytes % 640, height = first_byte % 480
    texts = [
        "a" * 100,   # width 100 (bin 1), height ord('a')=97 -> landscape
        "a" * 100,   # same cell
        "b" * 50,    # width 50 (bin 0), height ord('b')=98 -> portrait
    ]
    rows = {(r["orientation"], r["width_bin"]): r for r in
            dim_profile_frame(_docs(spark, texts)).collect()}
    assert rows[("landscape", 1)]["n_images"] == 2
    assert rows[("landscape", 1)]["total_bytes"] == 200
    assert rows[("landscape", 1)]["min_height"] == 97
    assert rows[("portrait", 0)]["n_images"] == 1
    assert rows[("portrait", 0)]["max_height"] == 98


def test_phash_quality_catches_exact_dups(spark):
    """Exact byte duplicates have Hamming 0, so every band agrees and
    the banded join catches them — recall 1e6 on a dup-only truth set.
    Doc ids are chosen inside the md5 hash-sample (mod 2)."""
    from etl_neotel_sql_automation_spark.ops.hashing import py_md5_long
    from etl_neotel_sql_automation_spark.workload.wave73 import (
        phash_quality_frame,
    )

    # find two ids in the sample
    ids = [i for i in range(40) if py_md5_long(str(i)) % 2 == 0][:2]
    base = "the quick brown fox jumps over the lazy dog again and again!"
    assert len(base) >= 60
    rows = [(ids[0], base), (ids[1], base)]
    # pad with ids OUTSIDE the sample so they cannot add truth pairs
    out = [i for i in range(40) if py_md5_long(str(i)) % 2 != 0][:2]
    rows += [(out[0], "z" * 60), (out[1], "y" * 60)]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    [r] = phash_quality_frame(df).collect()
    assert r["n_true"] == 1 and r["n_caught"] == 1
    assert r["recall_ppm"] == 1_000_000
    assert r["n_exact_dup"] == 1


def test_phash_capture_recapture_identical_pairs(spark):
    """Identical payloads share every band, so both occasions catch
    each pair: Chapman collapses to the caught count, zero missed."""
    from etl_neotel_sql_automation_spark.workload.wave73 import (
        phash_capture_recapture_frame,
    )

    base1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    base2 = "one two three four five six seven eight nine ten eleven twelve"
    assert len(base1) >= 60 and len(base2) >= 60
    texts = [base1, base1, base2, base2, "m" * 60, "w" * 60]
    [r] = phash_capture_recapture_frame(_docs(spark, texts)).collect()
    assert r["n_caught"] >= 2
    assert r["n1"] == r["n_caught"] and r["n2"] == r["n_caught"]
    assert r["m_both"] == r["n_caught"]
    assert r["chapman_est"] == r["n_caught"]
    assert r["est_missed"] == 0
    assert r["coverage_ppm"] == 1_000_000
