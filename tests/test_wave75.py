"""Fixture tests for the wave-75 (round 9) sampling/robust operators:
the A-ES ordering replayed in Python off the same hash, MoM's
robustness identity on uniform data, perplexity terms by hand, and the
top-k plan shape (TakeOrdered, not a global sort).
"""

from __future__ import annotations

import math


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    )


def test_weighted_reservoir_matches_python_replay(spark):
    from etl_neotel_sql_automation_spark.ops.hashing import py_md5_long
    from etl_neotel_sql_automation_spark.workload.wave75 import (
        _TWO60,
        weighted_reservoir_frame,
    )

    rows = [(i, float(10 + 7 * (i % 13))) for i in range(1, 101)]
    got = weighted_reservoir_frame(_orders(spark, rows), k=5).collect()

    def key(i, p):
        w = round(p * 100)
        u = (py_md5_long(str(i)) + 1) / float(_TWO60)
        return round(1e6 * math.log(u) / w)

    expect = sorted(
        ((key(i, p), i) for i, p in rows), key=lambda t: (-t[0], t[1])
    )[:5]
    assert [(r["key_micro"], r["o_orderkey"]) for r in got] == expect
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_weighted_reservoir_plans_take_ordered(spark):
    from etl_neotel_sql_automation_spark.workload.wave75 import (
        sample_weighted_reservoir,
    )

    plan = (
        sample_weighted_reservoir(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_median_of_means_on_uniform_data(spark):
    from etl_neotel_sql_automation_spark.workload.wave75 import (
        median_of_means_frame,
    )

    rows = [(i, 100.0) for i in range(1, 400)]
    [r] = median_of_means_frame(_orders(spark, rows)).collect()
    # identical values: every bucket mean == plain mean == MoM
    assert r["mean_millicents"] == 100_00 * 1000
    assert r["mom_millicents"] == r["mean_millicents"]
    assert r["bucket_min_millicents"] == r["bucket_max_millicents"]
    assert r["n_buckets"] == 32 and r["min_bucket_n"] >= 1


def test_doc_perplexity_terms_by_hand(spark):
    from etl_neotel_sql_automation_spark.workload.wave75 import (
        doc_perplexity_frame,
    )

    docs = spark.createDataFrame(
        [(0, "a a", "en", "s", 3), (1, "b", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = {r["doc_id"]: r for r in doc_perplexity_frame(docs).collect()}
    # counts: a=2, b=1; CT=3, V=2
    t_a = round(math.log(5 / 3) * 1e6)
    t_b = round(math.log(5 / 2) * 1e6)
    assert rows[0]["n_tokens"] == 2
    assert rows[0]["xent_micronat"] == (2 * t_a) // 2 == t_a
    assert rows[1]["n_tokens"] == 1
    assert rows[1]["xent_micronat"] == t_b
