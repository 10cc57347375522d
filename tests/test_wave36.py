"""Fixture tests for the wave-36 (round 7) Hilbert layout — the code
itself is proven against the Python reference (bijective, every
consecutive pair of indices grid-adjacent: the property Morton lacks),
and the layout meter is pinned on a constructed grid where pruning
behavior is forced: a box that matches every x but only half the y
range cannot be pruned at all by the x-sorted layout, while the
space-filling layouts must prune some files.
"""

from __future__ import annotations

import datetime


def test_hilbert_reference_properties():
    from etl_neotel_sql_automation_spark.ops.zorder import py_hilbert_value

    pos = {
        py_hilbert_value(x, y, 4): (x, y)
        for x in range(16)
        for y in range(16)
    }
    assert len(pos) == 256  # bijective on the full 4-bit grid
    for d in range(255):  # consecutive indices are grid neighbors
        (x0, y0), (x1, y1) = pos[d], pos[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_spark_expr_matches_reference(spark):
    from etl_neotel_sql_automation_spark.ops.zorder import (
        hilbert_expr,
        py_hilbert_value,
    )

    df = (
        spark.range(16)
        .selectExpr("id AS x")
        .crossJoin(spark.range(16).selectExpr("id AS y"))
    )
    rows = df.selectExpr("x", "y", hilbert_expr("x", "y", 4) + " AS hd")
    for r in rows.collect():
        assert r["hd"] == py_hilbert_value(r["x"], r["y"], 4)


def test_layout_meter_forced_pruning(spark, tmp_path):
    """64x64 grid: custkey 0..63 (all inside the box's x range), day
    offsets 370..433 (half inside y range [400, 799]). The x-sorted
    layout cannot prune: every file's y envelope spans the full range.
    The space-filling layouts must prune at least one file, and all
    layouts must agree on the matched-row count."""
    from etl_neotel_sql_automation_spark.workload.wave36 import (
        io_hilbert_layout,
    )

    epoch = datetime.datetime(1995, 1, 1)
    rows = []
    k = 0
    for x in range(64):
        for y in range(370, 434):
            rows.append((k, x, epoch + datetime.timedelta(days=y)))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    res = {
        r["layout"]: r
        for r in io_hilbert_layout(spark, str(tmp_path)).collect()
    }
    n_files = res["linear_custkey"]["n_files"]
    assert n_files == 8  # 4096 rows / 512
    assert res["linear_custkey"]["files_scanned"] == n_files
    assert res["hilbert"]["files_scanned"] < n_files
    assert res["zorder"]["files_scanned"] < n_files
    matched = 64 * 34  # y in 400..433
    for r in res.values():
        assert r["rows_matched"] == matched
        assert r["n_files"] == n_files


def test_deployed_layout_matches_simulation_semantics(spark, tmp_path):
    """The r8 deployed-write twin on the forced-pruning grid: same box
    semantics as the simulation (identical rows_matched everywhere),
    the x-sorted layout still cannot prune, the space-filling layouts
    still must, and the bucket-local file cut only ADDS ragged tail
    files (n_files >= the simulation's count per layout)."""
    from etl_neotel_sql_automation_spark.workload.wave36 import (
        io_hilbert_layout,
        io_hilbert_layout_deployed,
    )

    epoch = datetime.datetime(1995, 1, 1)
    rows = []
    k = 0
    for x in range(64):
        for y in range(370, 434):
            rows.append((k, x, epoch + datetime.timedelta(days=y)))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    dep = {
        r["layout"]: r
        for r in io_hilbert_layout_deployed(spark, str(tmp_path)).collect()
    }
    sim = {
        r["layout"]: r
        for r in io_hilbert_layout(spark, str(tmp_path)).collect()
    }
    for name in ("linear_custkey", "zorder", "hilbert"):
        assert dep[name]["rows_matched"] == sim[name]["rows_matched"]
        assert dep[name]["n_files"] >= sim[name]["n_files"]
    assert dep["linear_custkey"]["files_scanned"] == (
        dep["linear_custkey"]["n_files"]
    )
    assert dep["hilbert"]["files_scanned"] < dep["hilbert"]["n_files"]
    assert dep["zorder"]["files_scanned"] < dep["zorder"]["n_files"]


def test_deployed_layout_plan_has_no_global_sort_window(spark):
    """The deployed twin's whole point: every row_number window in the
    plan is PARTITIONED (bucket-local) — no single-partition window,
    the shape that made the simulation linear in one task at 100x."""
    from etl_neotel_sql_automation_spark.workload.wave36 import (
        io_hilbert_layout_deployed,
    )

    df = io_hilbert_layout_deployed(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # a global window materializes as 'Window [...], [code ASC ...]'
    # with an empty partition spec — Spark prints the partition keys
    # between the function list and ORDER BY; SinglePartition exchange
    # right below a Window is the smoking gun
    import re

    assert not re.search(
        r"Exchange SinglePartition[^\n]*\n[^\n]*Sort", plan
    ), plan
