"""Fixture tests for the wave-11 (round 6) workloads — semantics the
oracle differential cannot pin: PIT-join version selection (exactly
one version per fact, as-of correctness for migrated customers), the
erasure audit's referential consistency, trimmed-mean outlier
rejection, packing-waste arithmetic, and the PIT plan shape (equi-join
on the natural key, never a range-only join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pit_join_covers_every_order_exactly_once(spark):
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave11 import (
        scd2_point_in_time_join,
    )

    out = scd2_point_in_time_join(spark, SF).collect()
    total_orders = table(spark, SF, "orders").count()
    # half-open intervals partition time: every order hits exactly one
    # version — none lost, none duplicated
    assert sum(r["n_orders"] for r in out) == total_orders


def test_pit_join_is_as_of_not_current(spark):
    """A migrated customer's pre-cut orders must land in the OLD
    segment; a current-state join would put them in MIGRATED."""
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave11 import (
        _SCD2_CUT,
        scd2_point_in_time_join,
    )

    orders = table(spark, SF, "orders")
    cust = table(spark, SF, "customer")
    cut = F.lit(f"{_SCD2_CUT} 00:00:00").cast("timestamp")
    pre_cut_migrated = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .filter((F.col("c_custkey") % 3 == 0) & (F.col("o_orderdate") < cut))
        .count()
    )
    assert pre_cut_migrated > 0, "fixture needs pre-cut orders from migrators"
    out = {r["segment"]: r["n_orders"] for r in scd2_point_in_time_join(spark, SF).collect()}
    post_cut_migrated = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .filter((F.col("c_custkey") % 3 == 0) & (F.col("o_orderdate") >= cut))
        .count()
    )
    # MIGRATED bucket holds exactly the post-cut orders of migrators
    assert out["MIGRATED"] == post_cut_migrated


def test_pit_join_plans_as_natural_key_equi_join(spark):
    from etl_neotel_sql_automation_spark.workload.wave11 import (
        scd2_point_in_time_join,
    )

    plan = (
        scd2_point_in_time_join(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_erasure_audit_referential_consistency(spark):
    from etl_neotel_sql_automation_spark.workload import table
    from etl_neotel_sql_automation_spark.workload.wave11 import (
        _ERASE_MOD,
        privacy_erasure_audit,
    )

    rows = {r["table_name"]: r for r in privacy_erasure_audit(spark, SF).collect()}
    orders = table(spark, SF, "orders")
    direct_orders = orders.filter(F.col("o_custkey") % _ERASE_MOD == 1).count()
    assert rows["orders"]["n_rows_to_erase"] == direct_orders
    # fan-out only grows down the reference chain on avg-multi-line orders
    assert rows["lineitem"]["n_rows_to_erase"] >= rows["orders"]["n_rows_to_erase"]
    for r in rows.values():
        assert 0 <= r["exposure_ppm"] <= 1_000_000


def test_trimmed_mean_rejects_outlier(spark):
    from pyspark.sql import Window as W

    vals = [(i, i) for i in range(1, 10)] + [(10, 100_000)]  # one wild point
    df = spark.createDataFrame([("A", v, k) for k, v in vals], "flag string, cents long, k long")
    wf = W.partitionBy("flag")
    r = df.select(
        "flag",
        "cents",
        F.row_number().over(wf.orderBy("cents", "k")).alias("rn"),
        F.count("*").over(wf).alias("n"),
    )
    [row] = (
        r.groupBy("flag")
        .agg(
            F.expr(
                "CAST((1000 * sum(CASE WHEN rn > n div 10 AND rn <= n - n div 10"
                " THEN cents END)) div sum(CASE WHEN rn > n div 10"
                " AND rn <= n - n div 10 THEN 1 END) AS BIGINT)"
            ).alias("trimmed"),
            F.expr("CAST((1000 * sum(cents)) div count(*) AS BIGINT)").alias("raw"),
        )
        .collect()
    )
    # 10 points: trim drops rank 1 and rank 10 (the 100k outlier);
    # middle 8 = 2..9 -> mean 5.5 -> 5500 millicents
    assert row["trimmed"] == 5500
    assert row["raw"] > 10_000_000 // 10  # outlier dominates the raw mean


def test_packing_waste_hand_fixture(spark):
    docs = spark.createDataFrame(
        [("s1", 10), ("s1", 20)], "source string, nt long"
    )
    L = 16
    doc_padded = docs.select(
        F.expr(f"((nt + {L} - 1) div {L}) * {L}").alias("p")
    ).agg(F.sum("p").alias("s")).collect()[0]["s"]
    assert doc_padded == 16 + 32  # ceil(10/16)*16 + ceil(20/16)*16
    packed = docs.groupBy("source").agg(F.sum("nt").alias("st")).select(
        F.expr(f"((st + {L} - 1) div {L}) * {L}").alias("p")
    ).collect()[0]["p"]
    assert packed == 32  # ceil(30/16)*16 — the tail is the only waste
