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


def test_persisted_lsh_index_selfjoin_is_shuffle_free(spark):
    """The LSH index written as a bucketed table must run its candidate
    self-join (the 100 TB-dominant operation) with no Exchange on the
    bucket key, and must produce the SAME near-dup pairs as the direct
    in-memory multi-table path with identical parameters."""
    from etl_neotel_sql_automation_spark.ops import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    spark.sql("DROP TABLE IF EXISTS lsh_idx")
    S.write_lsh_index(emb, "lsh_idx", tables=4, planes_per_table=4)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = S.lsh_near_dup_pairs_indexed(spark, "lsh_idx", threshold=0.35)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(tb" not in plan
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        direct = S.lsh_near_dup_pairs(emb, 0.35, tables=4, planes_per_table=4)
        want = {(r.id_a, r.id_b) for r in direct.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS lsh_idx")


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


def test_streaming_append_keeps_lsh_index_equivalent_and_shuffle_free(spark, tmp_path):
    """The 100 TB index-maintenance loop: bulk-build the LSH index from
    half the corpus, stream the other half in as parquet micro-batches
    (foreachBatch -> bucketed append), then verify (a) the appended
    index yields EXACTLY the pairs a full-corpus build would, and
    (b) the candidate self-join is still Exchange-free — i.e. appends
    preserved the bucket layout, so no rebuild is ever needed."""
    from etl_neotel_sql_automation_spark.io_sinks import drop_managed_table
    from etl_neotel_sql_automation_spark.ops import similarity as S
    from etl_neotel_sql_automation_spark.streaming.landing import (
        stream_append_lsh_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    drop_managed_table(spark, "lsh_idx_stream")
    S.write_lsh_index(first, "lsh_idx_stream", tables=4, planes_per_table=4)

    landing = tmp_path / "landing"
    landing.mkdir()
    # two files -> two micro-batch appends under availableNow
    for i, part in enumerate((second.filter(F.col("vec_id") % 4 == 1),
                              second.filter(F.col("vec_id") % 4 == 3))):
        part.select("vec_id", "embedding").coalesce(1).write.parquet(
            str(landing / f"batch{i}")
        )
    schema = spark.read.parquet(str(landing / "batch0")).schema
    q = stream_append_lsh_index(
        spark, str(landing / "batch*"), "lsh_idx_stream",
        str(tmp_path / "ckpt"), schema,
    )
    q.awaitTermination()

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = S.lsh_near_dup_pairs_indexed(spark, "lsh_idx_stream", threshold=0.35)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(tb" not in plan
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        direct = S.lsh_near_dup_pairs(emb, 0.35, tables=4, planes_per_table=4)
        want = {(r.id_a, r.id_b) for r in direct.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        drop_managed_table(spark, "lsh_idx_stream")
