"""Fixture tests for the wave-16 (round 6) workloads — semantics the
oracle differential cannot pin: the water level's optimality (largest
integer level that fits the budget) and both boundary branches, the
migration matrix's churn/win-back cells and share partition, and the
streaming OOV monitor's row-for-row equality with its batch twin (the
policy test its tripwire exclusion cites).
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_water_filling_interior_level(spark, tmp_path):
    """Demands {10, 20, 70}, budget 50: served(10)=30, served(20)=50
    -> λ = 20 exactly; allocations 10/20/20 spend the whole budget."""
    from etl_neotel_sql_automation_spark.workload.wave16 import (
        alloc_water_filling,
    )

    rows = [
        (0, " ".join(f"t{i}" for i in range(10)), "en", "small"),
        (1, " ".join(f"t{i}" for i in range(20)), "en", "mid"),
        (2, " ".join(f"t{i}" for i in range(70)), "en", "big"),
    ]
    out = {r["source"]: r for r in
           alloc_water_filling(spark, _docs(spark, tmp_path, rows)).collect()}
    assert all(r["water_level"] == 20 for r in out.values())
    assert (out["small"]["allocated"], out["small"]["capped"]) == (10, 0)
    assert (out["mid"]["allocated"], out["mid"]["capped"]) == (20, 0)
    assert (out["big"]["allocated"], out["big"]["capped"]) == (20, 1)
    assert sum(r["allocated"] for r in out.values()) == 50


def test_water_filling_below_min_level(spark, tmp_path):
    """Demands {10, 10}, budget 10: even the smallest level overshoots
    -> λ = budget div n_src = 5, both capped."""
    from etl_neotel_sql_automation_spark.workload.wave16 import (
        alloc_water_filling,
    )

    rows = [
        (0, " ".join(f"a{i}" for i in range(10)), "en", "s1"),
        (1, " ".join(f"b{i}" for i in range(10)), "en", "s2"),
    ]
    out = alloc_water_filling(spark, _docs(spark, tmp_path, rows)).collect()
    assert all(r["water_level"] == 5 for r in out)
    assert all(r["allocated"] == 5 and r["capped"] == 1 for r in out)


def test_water_filling_level_is_maximal_on_real_data(spark):
    """λ is the LARGEST integer fitting the budget: spend(λ) <= B and
    spend(λ+1) > B whenever anyone is capped."""
    from etl_neotel_sql_automation_spark.workload.wave16 import (
        alloc_water_filling,
    )

    out = alloc_water_filling(spark, SF).collect()
    lam = out[0]["water_level"]
    budget = sum(r["demand"] for r in out) // 2
    spend = sum(min(r["demand"], lam) for r in out)
    spend_next = sum(min(r["demand"], lam + 1) for r in out)
    assert spend <= budget
    if any(r["capped"] for r in out):
        assert spend_next > budget


def test_rfm_migration_cells_and_partition(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave16 import (
        orders_rfm_migration,
    )

    pre = datetime.datetime(1996, 5, 1)
    post = datetime.datetime(1999, 5, 1)
    rows = []
    oid = 0
    # cust 1: LOW -> NONE (churn); cust 2: MID -> HIGH; cust 3: NONE -> LOW
    for _ in range(1):
        rows.append((oid := oid + 1, 1, "O", 1.0, pre, "x"))
    for _ in range(2):
        rows.append((oid := oid + 1, 2, "O", 1.0, pre, "x"))
    for _ in range(4):
        rows.append((oid := oid + 1, 2, "O", 1.0, post, "x"))
    rows.append((oid := oid + 1, 3, "O", 1.0, post, "x"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = {(r["seg_from"], r["seg_to"]): r
           for r in orders_rfm_migration(spark, str(tmp_path)).collect()}
    assert out[("LOW", "NONE")]["n_customers"] == 1   # churn cell
    assert out[("MID", "HIGH")]["n_customers"] == 1
    assert out[("NONE", "LOW")]["n_customers"] == 1   # win-back cell
    assert sum(r["n_customers"] for r in out.values()) == 3
    assert sum(r["share_ppm"] for r in out.values()) >= 1_000_000 - len(out)


def test_streaming_oov_equals_batch_meter(spark):
    """The policy test the tripwire exclusion cites: the streaming
    monitor must equal the batch text_oov_rate row-for-row (same
    vocab, same split, same arithmetic — only the execution mode
    differs)."""
    from etl_neotel_sql_automation_spark.workload.wave15 import text_oov_rate
    from etl_neotel_sql_automation_spark.workload.wave16 import (
        streaming_oov_monitor,
    )

    batch = [tuple(r) for r in text_oov_rate(spark, SF).collect()]
    stream = [tuple(r) for r in streaming_oov_monitor(spark, SF).collect()]
    assert stream == batch
