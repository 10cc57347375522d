"""Fixture tests for the wave-15 (round 6) workloads — semantics the
oracle differential cannot pin: OOV arithmetic on a hand-built
vocabulary split, the sequential-gap identities, interpolated quartile
values against hand-computed quantile_cont, and the dedup-impact
accounting (keeper never counted as removed; token loss exact).
"""

from __future__ import annotations

import datetime


def test_oov_rate_hand_built_split(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave15 import text_oov_rate

    spark.createDataFrame(
        [
            (0, "w1 w2 w1", "en", "src0"),     # train: vocab = {w1, w2}
            (1, "w1 w2 zz zz", "en", "evalA"),  # 2 of 4 tokens OOV
            (2, "w1 w1", "en", "evalB"),        # 0 of 2 OOV
        ],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in text_oov_rate(spark, str(tmp_path)).collect()}
    assert set(out) == {"evalA", "evalB"}
    assert (out["evalA"]["n_tokens"], out["evalA"]["n_oov"]) == (4, 2)
    assert out["evalA"]["oov_ppm"] == 500_000
    assert (out["evalB"]["n_tokens"], out["evalB"]["n_oov"]) == (2, 0)
    assert out["evalB"]["oov_ppm"] == 0


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_sequential_gaps_identities(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave15 import dq_sequential_gaps

    d = datetime.datetime(1996, 1, 2)
    rows = [(k, 1, "O", 1.0, d, "x") for k in (1, 2, 2, 5)]
    row = dq_sequential_gaps(spark, _orders(spark, tmp_path, rows)).collect()[0]
    assert (row["key_min"], row["key_max"]) == (1, 5)
    assert (row["n_rows"], row["n_distinct"]) == (4, 3)
    assert row["n_missing"] == 2  # keys 3 and 4
    assert row["n_dups"] == 1


def test_interarrival_quartiles_hand_computed(spark, tmp_path):
    """One customer, orders at days 0/10/30: gaps {10, 20}.
    quantile_cont gives p25=12.5, p50=15, p75=17.5 days — i.e.
    50/60/70 quarter-days exactly."""
    from etl_neotel_sql_automation_spark.workload.wave15 import (
        orders_interarrival_quartiles,
    )

    base = datetime.datetime(1996, 1, 1)
    rows = [
        (i, 7, "O", 1.0, base + datetime.timedelta(days=d), "x")
        for i, d in enumerate((0, 10, 30))
    ]
    out = orders_interarrival_quartiles(
        spark, _orders(spark, tmp_path, rows)
    ).collect()
    got = {r["quartile"]: r["gap_quarterdays"] for r in out}
    assert all(r["n_gaps"] == 2 for r in out)
    assert got == {1: 50, 2: 60, 3: 70}


def test_dedup_impact_accounting(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave15 import (
        quality_dedup_impact,
    )

    spark.createDataFrame(
        [
            (0, "a b", "en", "s"),
            (1, "a b", "en", "s"),   # duplicate of doc 0 -> removed
            (2, "c", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = quality_dedup_impact(spark, str(tmp_path)).collect()[0]
    assert (row["n_docs"], row["n_removed"]) == (3, 1)
    assert (row["n_tokens"], row["tokens_removed"]) == (5, 2)
    assert row["token_loss_ppm"] == 400_000


def test_dedup_impact_keeper_never_removed(spark):
    """Across real data the removed count per source can never exceed
    docs-1 per fingerprint group; globally sum(removed) equals
    n_docs - n_fingerprints."""
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave15 import (
        quality_dedup_impact,
    )
    from pyspark.sql import functions as F
    from etl_neotel_sql_automation_spark.ops import text as X

    sf = "/root/testdata/sf0.001"
    out = quality_dedup_impact(spark, sf).collect()
    docs = table(spark, sf, "documents")
    n_docs = docs.count()
    n_fp = docs.select(X.fingerprint_md5(F.col("text"))).distinct().count()
    assert sum(r["n_removed"] for r in out) == n_docs - n_fp
    assert sum(r["n_docs"] for r in out) == n_docs
