"""Fixture tests for the wave-9 (round 6) workloads — semantics the
oracle differential cannot pin: interpolated-percentile validity
against an independent engine builtin, pseudonym injectivity and
determinism, cross-BLEU's redundancy extremes, MASE on a perfectly
periodic series, and the exact -1 assortativity of a star.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# agg_percentile_cont_exact: the quarter-cent integers must equal
# 4 * PERCENTILE_CONT from an INDEPENDENT implementation (DuckDB's
# quantile_cont) — the differential only proves both copies of OUR
# formula agree.
# ---------------------------------------------------------------------------


def test_percentile_cont_matches_engine_builtin(spark):
    from etl_neotel_sql_automation_spark.workload.wave9 import (
        agg_percentile_cont_exact,
    )

    got = {
        (r["flag"], r["quartile"]): r["value_quarter_cents"]
        for r in agg_percentile_cont_exact(spark, SF).collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT l_returnflag AS flag,
               quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                             [0.25, 0.5, 0.75]) AS qcs
        FROM '{SF}/lineitem.parquet'
        GROUP BY 1
        """
    ).fetchall()
    assert got
    for flag, qcs in ref:
        for k, qc in enumerate(qcs, start=1):
            assert got[(flag, k)] == round(qc * 4), (flag, k, qc, got[(flag, k)])


# ---------------------------------------------------------------------------
# privacy_pseudonymize: surrogate keys must be injective on the
# population (collision would silently merge two customers' history)
# and deterministic across runs.
# ---------------------------------------------------------------------------


def test_pseudonym_injective_and_deterministic(spark):
    from etl_neotel_sql_automation_spark.workload import table

    cust = table(spark, SF, "customer")
    p = cust.select(
        "c_custkey",
        F.expr(
            "substr(md5(concat('cust:', CAST(c_custkey AS STRING))), 1, 16)"
        ).alias("pseud"),
    )
    [row] = p.agg(
        F.countDistinct("c_custkey").alias("nk"),
        F.countDistinct("pseud").alias("np"),
    ).collect()
    assert row["nk"] == row["np"]  # injective on this population
    # deterministic: two independent evaluations agree row-for-row
    a = {r["c_custkey"]: r["pseud"] for r in p.collect()}
    b = {r["c_custkey"]: r["pseud"] for r in p.collect()}
    assert a == b
    # no raw key appears in the registered output's columns
    from etl_neotel_sql_automation_spark.workload.wave9 import privacy_pseudonymize

    assert "c_custkey" not in privacy_pseudonymize(spark, SF).columns


# ---------------------------------------------------------------------------
# corpus_cross_bleu extremes: a source whose bigrams all exist
# elsewhere scores 10^6 ppm; a source of corpus-unique bigrams
# scores 0.
# ---------------------------------------------------------------------------


def test_cross_bleu_redundancy_extremes(spark):
    from pyspark.sql import Window as W

    docs = spark.createDataFrame(
        [
            ("dup", "a b c d"),
            ("base", "a b c d e"),
            ("uniq", "x y z w"),
        ],
        "source string, text string",
    )
    from etl_neotel_sql_automation_spark.ops import text as X

    toks = X.tokens(F.col("text"))
    cnt = F.size(toks)
    idx = F.when(cnt >= 2, F.sequence(F.lit(1), cnt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    b = docs.select("source", toks.alias("toks"), F.explode(idx).alias("pos")).select(
        "source",
        F.concat_ws(
            " ",
            F.element_at("toks", F.col("pos")),
            F.element_at("toks", F.col("pos") + 1),
        ).alias("g"),
    )
    sc = b.groupBy("source", "g").agg(F.count("*").alias("c"))
    w = sc.withColumn("tot", F.sum("c").over(W.partitionBy("g")))
    out = {
        r["source"]: r["ppm"]
        for r in w.groupBy("source")
        .agg(
            F.expr(
                "CAST((1000000 * sum(least(c, tot - c))) div sum(c) AS BIGINT)"
            ).alias("ppm")
        )
        .collect()
    }
    assert out["dup"] == 1_000_000  # every dup bigram exists in base
    assert out["uniq"] == 0  # nothing shared


# ---------------------------------------------------------------------------
# MASE: a perfectly 12-periodic series has zero seasonal error ->
# mase_ppm == 0 while the one-step naive error stays positive.
# ---------------------------------------------------------------------------


def test_mase_zero_on_periodic_series(spark):
    from pyspark.sql import Window as W

    s = spark.createDataFrame(
        [("S", m, 100 + 10 * (m % 12)) for m in range(36)],
        "seg string, m long, y long",
    )
    wm = W.partitionBy("seg").orderBy("m")
    r = s.select(
        "seg",
        "y",
        F.lag("y", 12).over(wm).alias("y12"),
        F.lag("y", 1).over(wm).alias("y1"),
    )
    [e] = (
        r.groupBy("seg")
        .agg(
            F.sum(
                F.when(F.col("y12").isNotNull(), F.abs(F.col("y") - F.col("y12")))
            ).alias("sum_s"),
            F.sum(
                F.when(F.col("y1").isNotNull(), F.abs(F.col("y") - F.col("y1")))
            ).alias("sum_n"),
        )
        .collect()
    )
    assert e["sum_s"] == 0  # period-12 signal: lag-12 forecast is exact
    assert e["sum_n"] > 0  # one-step naive still errs


# ---------------------------------------------------------------------------
# Assortativity: a star graph is exactly -1 (every edge pairs the hub
# degree with a leaf degree).
# ---------------------------------------------------------------------------


def test_star_graph_assortativity_is_minus_one(spark):
    n_leaves = 6
    e0 = spark.createDataFrame(
        [(0, i) for i in range(1, n_leaves + 1)], "src long, dst long"
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    ds = deg.select(F.col("id").alias("id_s"), F.col("d").alias("d_s"))
    dd = deg.select(F.col("id").alias("id_d"), F.col("d").alias("d_d"))
    [row] = (
        edges.join(ds, edges.src == ds.id_s)
        .join(dd, edges.dst == dd.id_d)
        .agg(F.round(F.corr("d_s", "d_d"), 6).alias("a"))
        .collect()
    )
    assert row["a"] == -1.0
