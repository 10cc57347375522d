"""Upsert/SCD2 merge semantics and partition-pruning proof."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.ops.merge import scd2_apply, upsert


def test_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    out = {r.k: (r.name, r.v) for r in upsert(target, updates, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_apply(spark):
    t0 = dt.datetime(2026, 1, 1)
    t1 = dt.datetime(2026, 8, 13)
    dim = spark.createDataFrame(
        [
            (1, "ana", t0, None, True),
            (2, "bob", t0, None, True),
            (1, "ana_old", dt.datetime(2025, 1, 1), t0, False),  # history row
        ],
        "k long, name string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame([(1, "ana_v2")], "k long, name string")
    out = scd2_apply(dim, updates, "k", now=F.lit(t1))
    rows = sorted(
        ((r.k, r.name, r.is_current, r.valid_to) for r in out.collect()),
        key=lambda x: (x[0], str(x[1])),
    )
    assert rows == [
        (1, "ana", False, t1),            # closed
        (1, "ana_old", False, t0),        # history untouched
        (1, "ana_v2", True, None),        # new current
        (2, "bob", True, None),           # unmatched untouched
    ]
    # invariant: exactly one current row per key
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on the partition column must prune at planning time:
    the scan reads only the matching partition directories."""
    out = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(i, f"2026-08-{10 + i % 3:02d}") for i in range(300)], "v long, fecha string"
    )
    df.write.partitionBy("fecha").parquet(out)
    q = spark.read.parquet(out).filter(F.col("fecha") == "2026-08-11")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    assert "PartitionFilters: [isnotnull(fecha" in scan
    assert "= 2026-08-11" in scan
    assert q.count() == 100
    # negative control: unfiltered scan reads all three
    assert spark.read.parquet(out).count() == 300
