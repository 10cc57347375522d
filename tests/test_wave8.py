"""Fixture tests for the wave-8 (round 6) workloads — semantics the
oracle differential cannot pin because both engines share the same
formula: the apportionment exact-sum invariant, FIFO's prefix-sum
take rule, the t-closeness absent-value identity, Kneser-Ney's
sums-to-one property, Theil-Sen outlier immunity, Mann-Kendall's
monotone extreme, OHLC open/close tiebreaks, and the FD audit on an
exact key.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# alloc_largest_remainder: the whole point is sum(alloc) == budget
# EXACTLY — an invariant the differential proves only if both engines
# are right together.
# ---------------------------------------------------------------------------


def test_alloc_sums_exactly_to_budget(spark):
    from etl_neotel_sql_automation_spark.workload.wave8 import (
        _ALLOC_BUDGET,
        alloc_largest_remainder,
    )

    rows = alloc_largest_remainder(spark, SF).collect()
    assert sum(r["alloc_units"] for r in rows) == _ALLOC_BUDGET
    for r in rows:
        assert r["extra_unit"] in (0, 1)
        assert r["alloc_units"] == r["base_units"] + r["extra_unit"]
    # floor quotas alone under-shoot; remainders close the gap
    assert sum(r["base_units"] for r in rows) <= _ALLOC_BUDGET


# ---------------------------------------------------------------------------
# inventory_fifo_allocation: the prefix-sum take rule on a
# hand-computed fixture, and allocated == min(supply, demand) on the
# real data.
# ---------------------------------------------------------------------------


def test_fifo_take_rule_hand_fixture(spark):
    lots = spark.createDataFrame(
        [(1, 5, 1), (1, 3, 2), (1, 4, 3)], "pk int, qty long, ord int"
    )
    demand = 7
    c = lots.withColumn(
        "cum_before",
        F.sum("qty").over(
            W.partitionBy("pk").orderBy("ord").rowsBetween(W.unboundedPreceding, 0)
        )
        - F.col("qty"),
    )
    a = c.select(
        "ord",
        F.least(
            F.col("qty"), F.greatest(F.lit(demand) - F.col("cum_before"), F.lit(0))
        ).alias("take"),
    )
    got = {r["ord"]: r["take"] for r in a.collect()}
    # FIFO over lots [5, 3, 4] with demand 7: take [5, 2, 0]
    assert got == {1: 5, 2: 2, 3: 0}


def test_fifo_allocated_is_min_of_supply_and_demand(spark):
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave8 import (
        inventory_fifo_allocation,
    )

    out = inventory_fifo_allocation(spark, SF)
    li = table(spark, SF, "lineitem")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    supply = (
        li.filter(F.col("l_shipdate") < cutoff)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("supply"))
    )
    joined = out.join(supply, "partkey").collect()
    assert joined, "expected parts with both supply and demand"
    for r in joined:
        assert r["allocated"] == min(r["supply"], r["demand"])
        assert r["unfilled"] == r["demand"] - r["allocated"]
        assert 0 < r["n_lots_used"]


# ---------------------------------------------------------------------------
# privacy_t_closeness: the absent-value identity against a by-hand
# total-variation distance, including a group that matches the global
# distribution exactly (t = 0) and a fully skewed group.
# ---------------------------------------------------------------------------


def test_t_closeness_identity_hand_fixture(spark):
    # population: A x3, B x3 (N=6, g_A=g_B=3)
    # group 3 = {A, B}: matches global -> t = 0
    # groups 1 = {A, A}, 2 = {B, B}: TV = (|1-.5| + |0-.5|)/2 = 0.5
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "B"), (2, "B"), (3, "A"), (3, "B")],
        "grp int, seg string",
    )
    g = df.groupBy("grp", "seg").agg(F.count("*").alias("cnt"))
    gv = df.groupBy("seg").agg(F.count("*").alias("gcnt"))
    pop = df.agg(F.count("*").alias("nn"))
    gk = g.withColumn("k", F.sum("cnt").over(W.partitionBy("grp")))
    t = (
        gk.join(gv, "seg")
        .crossJoin(F.broadcast(pop))
        .groupBy("grp")
        .agg(
            F.max("k").alias("k"),
            F.max("nn").alias("nn"),
            F.sum(F.abs(F.col("cnt") * F.col("nn") - F.col("gcnt") * F.col("k")))
            .alias("s_abs"),
            F.sum("gcnt").alias("s_g"),
        )
        .select(
            "grp",
            F.expr("(1000000 * (nn * k - k * s_g + s_abs)) div (2 * k * nn)").alias(
                "t_ppm"
            ),
        )
    )
    got = {r["grp"]: r["t_ppm"] for r in t.collect()}
    assert got == {1: 500000, 2: 500000, 3: 0}


def test_t_closeness_bounds_on_real_data(spark):
    from etl_neotel_sql_automation_spark.workload.wave8 import privacy_t_closeness

    for r in privacy_t_closeness(spark, SF).collect():
        assert 0 <= r["max_t_ppm"] <= 1_000_000
        assert 0 <= r["n_breaching"] <= r["n_groups"]


# ---------------------------------------------------------------------------
# Kneser-Ney: for every context w1, sum over the WHOLE w2 vocabulary
# (unseen bigrams get pure continuation mass — that redistribution IS
# the smoothing) of P_KN(w2|w1) == 1 exactly in rational arithmetic —
# with per-bigram ppm floors the integer sum must land in
# [10^6 - vocab, 10^6]. A discount or continuation-mass bug breaks
# this band immediately; the top-20 differential never would.
# ---------------------------------------------------------------------------


def test_kneser_ney_rows_sum_to_one(spark):
    from etl_neotel_sql_automation_spark.ops import text as X
    from etl_neotel_sql_automation_spark.workload import table

    docs = table(spark, SF, "documents")
    toks = X.tokens(F.col("text"))
    cnt = F.size(toks)
    idx = F.when(cnt >= 2, F.sequence(F.lit(1), cnt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    b = docs.select(toks.alias("toks"), F.explode(idx).alias("pos")).select(
        F.element_at("toks", F.col("pos")).alias("w1"),
        F.element_at("toks", F.col("pos") + 1).alias("w2"),
    )
    bc = b.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uc = bc.groupBy("w1").agg(F.sum("c12").alias("c1"), F.count("*").alias("n1fw"))
    cw = bc.groupBy("w2").agg(F.count("*").alias("nbw"))
    sc = bc.agg(F.count("*").alias("btypes"))
    # densify: every context x every continuation type; unseen pairs
    # carry c12 = 0 (pure continuation mass)
    dense = (
        uc.crossJoin(cw)
        .join(bc, ["w1", "w2"], "left")
        .withColumn("c12", F.coalesce("c12", F.lit(0)))
        .crossJoin(F.broadcast(sc))
        .select(
            "w1",
            F.expr(
                "CAST((1000000 * (btypes * greatest(4 * c12 - 3, 0)"
                " + 3 * n1fw * nbw)) div (4 * c1 * btypes) AS BIGINT)"
            ).alias("p_kn_ppm"),
        )
    )
    sums = dense.groupBy("w1").agg(
        F.sum("p_kn_ppm").alias("s"), F.count("*").alias("vocab")
    )
    rows = sums.collect()
    assert rows
    for r in rows:
        assert 1_000_000 - r["vocab"] <= r["s"] <= 1_000_000, (
            f"context {r['w1']}: KN mass {r['s']} ppm over {r['vocab']} vocab"
        )


# ---------------------------------------------------------------------------
# Theil-Sen: immune to a single wild outlier that would wreck OLS.
# ---------------------------------------------------------------------------


def test_theil_sen_outlier_immunity(spark):
    pts = [(m, 10 + 3 * m) for m in range(10)]
    pts[5] = (5, pts[5][1] + 100_000)  # one wild outlier
    s = spark.createDataFrame(
        [("S", m, y) for m, y in pts], "seg string, m long, y long"
    )
    a = s.select("seg", F.col("m").alias("mi"), F.col("y").alias("yi"))
    b = s.select(
        F.col("seg").alias("seg_b"), F.col("m").alias("mj"), F.col("y").alias("yj")
    )
    p = a.join(b, (a.seg == b.seg_b) & (a.mi < b.mj)).select(
        "seg",
        "mi",
        "mj",
        F.expr(
            "CAST(sign(yj - yi) AS BIGINT)"
            " * ((1000000 * abs(yj - yi)) div (mj - mi))"
        ).alias("slope_micro"),
    )
    wseg = W.partitionBy("seg")
    r = p.select(
        "slope_micro",
        F.row_number().over(wseg.orderBy("slope_micro", "mi", "mj")).alias("rn"),
        F.count("*").over(wseg).alias("np"),
    ).filter(F.expr("rn = (np + 1) div 2"))
    [row] = r.collect()
    assert row["slope_micro"] == 3_000_000  # the true slope, outlier ignored


def test_mann_kendall_monotone_tau_is_one(spark):
    from etl_neotel_sql_automation_spark.workload.wave8 import (
        timeseries_mann_kendall,
    )

    # real-data sanity: tau bounded, pairs consistent
    for r in timeseries_mann_kendall(spark, SF).collect():
        assert -1_000_000 <= r["tau_ppm"] <= 1_000_000
        assert abs(r["s_stat"]) <= r["n_pairs"]
    # strictly increasing fixture: every pair concordant -> S == pairs
    s = spark.createDataFrame(
        [("S", m, m * 2) for m in range(8)], "seg string, m long, y long"
    )
    a = s.select("seg", F.col("m").alias("mi"), F.col("y").alias("yi"))
    b = s.select(
        F.col("seg").alias("seg_b"), F.col("m").alias("mj"), F.col("y").alias("yj")
    )
    p = a.join(b, (a.seg == b.seg_b) & (a.mi < b.mj)).select(
        F.expr("CAST(sign(yj - yi) AS BIGINT)").alias("sgn")
    )
    [row] = p.agg(F.sum("sgn").alias("s"), F.count("*").alias("n")).collect()
    assert row["s"] == row["n"] == 28


# ---------------------------------------------------------------------------
# OHLC: open/close come from the full (shipdate, orderkey, linenumber)
# tiebreak — two rows on the same timestamp must resolve by key order.
# ---------------------------------------------------------------------------


def test_ohlc_open_close_tiebreak(spark):
    rows = [
        # (m, cents, qty, sd, ok, ln) — sd ties on the first two rows
        (0, 500, 1, "1992-01-02", 7, 1),
        (0, 300, 1, "1992-01-02", 3, 2),  # same day, smaller orderkey -> open
        (0, 900, 1, "1992-01-15", 9, 1),
        (0, 100, 1, "1992-01-30", 1, 1),  # last day -> close
    ]
    r = spark.createDataFrame(
        rows, "m long, cents long, qty long, sd string, ok long, ln int"
    ).withColumn("sd", F.col("sd").cast("timestamp"))
    wm = W.partitionBy("m")
    w = r.select(
        "m",
        "cents",
        F.row_number().over(wm.orderBy("sd", "ok", "ln")).alias("rn_a"),
        F.row_number()
        .over(wm.orderBy(F.desc("sd"), F.desc("ok"), F.desc("ln")))
        .alias("rn_d"),
    )
    [out] = (
        w.groupBy("m")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("open"),
            F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("close"),
        )
        .collect()
    )
    assert out["open"] == 300  # orderkey 3 beats 7 on the tied day
    assert out["close"] == 100


# ---------------------------------------------------------------------------
# FD audit: a true key must conform exactly; a violated FD must carry
# a positive repair size.
# ---------------------------------------------------------------------------


def test_fd_audit_key_conforms_exactly(spark):
    from etl_neotel_sql_automation_spark.workload.wave8 import dq_fd_violations

    rows = {r["fd"]: r for r in dq_fd_violations(spark, SF).collect()}
    key = rows["orders: o_orderkey->o_orderstatus"]
    assert key["n_violating_lhs"] == 0
    assert key["g3_rows_to_fix"] == 0
    assert key["conform_ppm"] == 1_000_000
    violated = rows["lineitem: l_partkey->l_suppkey"]
    assert violated["n_violating_lhs"] > 0
    assert 0 < violated["g3_rows_to_fix"] < violated["n_rows"]
    assert violated["conform_ppm"] < 1_000_000
