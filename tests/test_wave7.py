"""Fixture tests for the wave-4 (round 6) workloads — semantics the
oracle differential cannot pin because both engines would share the
same bug: survivorship vote/tiebreak rules, compaction bin boundary
behavior, shuffle determinism across seeds, and RRF's missing-leg
handling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Golden-record survivorship: majority name wins; ties resolve to the
# lexicographic minimum; balance takes the max.
# ---------------------------------------------------------------------------


def test_golden_record_vote_and_tiebreak(spark):
    from pyspark.sql import Window as W

    members = spark.createDataFrame(
        [
            # entity 1: majority "Alice" (2 votes) beats "Alixe"
            (1, "Alixe", 100),
            (1, "Alice", 90),
            (1, "Alice", 80),
            # entity 2: 1-1 tie -> lexicographic min "Bob" over "Boc"
            (2, "Boc", 50),
            (2, "Bob", 40),
        ],
        "entity_key int, name string, bal_cent long",
    )
    votes = members.groupBy("entity_key", "name").agg(F.count("*").alias("votes"))
    wv = W.partitionBy("entity_key").orderBy(F.desc("votes"), "name")
    best = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("entity_key", "name")
    )
    got = {r["entity_key"]: r["name"] for r in best.collect()}
    assert got == {1: "Alice", 2: "Bob"}
    bal = {
        r["entity_key"]: r["m"]
        for r in members.groupBy("entity_key").agg(F.max("bal_cent").alias("m")).collect()
    }
    assert bal == {1: 100, 2: 50}


def test_golden_record_members_match_link_clusters(spark):
    """Every entity in the golden output is a match_key of the link
    table, and its member count is 1 (master) + its probe links."""
    from etl_neotel_sql_automation_spark.workload.wave6c import (
        link_customer_entities,
    )
    from etl_neotel_sql_automation_spark.workload.wave7 import link_golden_record

    links = link_customer_entities(spark, SF).select("probe_key", "match_key")
    golden = link_golden_record(spark, SF)
    expected = (
        links.groupBy("match_key")
        .agg((F.count("*") + 1).alias("want"))
        .withColumnRenamed("match_key", "entity_key")
    )
    joined = golden.join(expected, "entity_key", "full_outer")
    bad = joined.filter(
        F.col("want").isNull()
        | F.col("n_members").isNull()
        | (F.col("want") != F.col("n_members"))
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Compaction bins: a file whose cumulative START lands exactly on the
# target boundary opens the next bin; bin ids are dense from 0.
# ---------------------------------------------------------------------------


def test_compaction_bin_boundary(spark):
    from pyspark.sql import Window as W

    target = 100
    files = spark.createDataFrame(
        [("a", 60), ("b", 40), ("c", 30)], "source string, bytes long"
    )
    w = W.orderBy(F.desc("bytes"), "source").rowsBetween(W.unboundedPreceding, 0)
    binned = files.withColumn("cum", F.sum("bytes").over(w)).select(
        "source",
        F.expr(f"CAST((cum - bytes) div {target} AS BIGINT)").alias("bin"),
    )
    got = {r["source"]: r["bin"] for r in binned.collect()}
    # a starts at 0 -> bin 0; b starts at 60 -> bin 0; c starts at
    # exactly 100 -> bin 1 (start-offset rule: the boundary opens a
    # new bin, the 100-byte bin 0 is exactly full)
    assert got == {"a": 0, "b": 0, "c": 1}


# ---------------------------------------------------------------------------
# Epoch shuffle: same seed -> identical permutation; different seed ->
# a different one; shards partition the corpus.
# ---------------------------------------------------------------------------


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    from etl_neotel_sql_automation_spark.ops.hashing import md5_long
    from etl_neotel_sql_automation_spark.workload.wave7 import (
        _SHUF_SHARDS,
        train_epoch_shuffle,
    )

    a = train_epoch_shuffle(spark, SF).collect()
    b = train_epoch_shuffle(spark, SF).collect()
    assert a == b
    assert sum(r["n_samples"] for r in a) == spark.read.parquet(
        f"{SF}/documents.parquet"
    ).count()
    assert {r["shard"] for r in a} <= set(range(_SHUF_SHARDS))

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def perm(seed: str):
        key = md5_long(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
        return [
            r["doc_id"]
            for r in docs.select("doc_id", key.alias("k")).orderBy("k", "doc_id").collect()
        ]

    assert perm("ep1") != perm("ep2")
    assert sorted(perm("ep1")) == sorted(perm("ep2"))


# ---------------------------------------------------------------------------
# RRF fusion: a doc present in only one leg still scores (the missing
# leg contributes 0, not null), and a doc in both legs outranks a
# same-rank doc in one leg.
# ---------------------------------------------------------------------------


def test_rrf_missing_leg_contributes_zero(spark):
    from etl_neotel_sql_automation_spark.workload.wave7 import sim_rrf_fusion

    out = sim_rrf_fusion(spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["rrf_ppb"] is not None and r["rrf_ppb"] > 0
        both = r["lex_rank"] is not None and r["dense_rank"] is not None
        single = (r["lex_rank"] is None) != (r["dense_rank"] is None)
        assert both or single
    # at least the fused column is consistent with its parts
    K = 60
    for r in rows:
        want = 0
        if r["lex_rank"] is not None:
            want += 10**9 // (K + r["lex_rank"])
        if r["dense_rank"] is not None:
            want += 10**9 // (K + r["dense_rank"])
        assert r["rrf_ppb"] == want


# ---------------------------------------------------------------------------
# Chi-square: a hand-computed 2x2 contingency table.
# ---------------------------------------------------------------------------


def test_chi_square_hand_computed(spark):
    # O = [[10, 20], [30, 40]]; N=100, rows=(30,70), cols=(40,60)
    # E = [[12, 18], [28, 42]]; chi2 = 4/12 + 4/18 + 4/28 + 4/42
    #    = 0.793650...  (per-cell micro-rounding then summed)
    cells = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30), ("b", 2, 40)],
        "t string, dow long, o long",
    )
    rows_ = cells.groupBy("t").agg(F.sum("o").cast("bigint").alias("r"))
    cols_ = cells.groupBy("dow").agg(F.sum("o").cast("bigint").alias("c2"))
    n_ = cells.agg(F.sum("o").cast("bigint").alias("n"))
    terms = (
        cells.join(rows_, "t")
        .join(cols_, "dow")
        .crossJoin(F.broadcast(n_))
        .select(
            "t",
            F.expr(
                "CAST(round((o * 1.0e0 * n - r * 1.0e0 * c2)"
                " * (o * 1.0e0 * n - r * 1.0e0 * c2)"
                " / (n * 1.0e0 * r * c2) * 1000000e0) AS BIGINT)"
            ).alias("tm"),
        )
    )
    total = terms.agg(F.sum("tm")).collect()[0][0]
    exact = round(4 / 12 * 1e6) + round(4 / 18 * 1e6) + round(4 / 28 * 1e6) + round(
        4 / 42 * 1e6
    )
    assert abs(total - exact) <= 2  # per-cell rounding of the double form
