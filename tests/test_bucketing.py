"""Bucketed-table test: a join between two tables bucketed on the join
key must run with zero shuffle (no Exchange in the physical plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.io_sinks import write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    yield "b_lineitem", "b_orders"
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    tl, to = bucketed_pair
    # disable broadcast so the join strategy must exploit bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(tl)
            .join(spark.table(to), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the join inputs come straight from bucketed scans: no Exchange
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and results are right
        total = sum(r.n for r in j.collect())
        assert total == spark.table(tl).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
