"""Scale-diagnostics workload: key-skew profiling and Z-order codes —
the observability + layout tools an operator runs BEFORE tuning a
100 TB job (which keys are hot? is the layout prunable on two
dimensions?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from ..ops.zorder import sql_z_value, z_value


@query(
    "diag_key_skew",
    oracle="""
    WITH k AS (
      SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT max(cnt) AS max_cnt, sum(cnt) AS total,
             count(*) AS n_keys FROM k
    )
    SELECT k.key, k.cnt,
           round(k.cnt / CAST(s.total AS DOUBLE), 6)            AS share,
           round(s.max_cnt * s.n_keys / CAST(s.total AS DOUBLE), 6)
                                                                 AS skew_factor
    FROM k CROSS JOIN s
    ORDER BY k.cnt DESC, k.key
    LIMIT 10
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew profile: per-key counts for the 10 hottest
    keys, each key's share of all rows, and the global skew factor
    (max/mean). This is the measurement that decides whether a join
    needs salting (ops.skew) or AQE skew handling. One hash aggregate
    plus a 1-row broadcast of the global stats — the profile costs one
    scan regardless of table size."""
    li = table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count("*").alias("cnt"))
    s = k.agg(
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_keys"),
    )
    return (
        k.crossJoin(F.broadcast(s))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total").cast("double"), 6).alias("share"),
            F.round(
                F.col("max_cnt") * F.col("n_keys") / F.col("total").cast("double"), 6
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(10)
    )


@query(
    "scalar_zorder",
    oracle=f"""
    SELECT p_partkey, p_size,
           {sql_z_value('p_partkey', 'CAST(p_size AS BIGINT)')} AS z
    FROM part
    """,
)
def scalar_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) codes for (p_partkey, p_size) — the clustering
    key ops.zorder.cluster_by_z sorts by before writing. Pure 64-bit
    shift/mask arithmetic, bit-identical across engines."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", "p_size", z_value("p_partkey", "p_size").alias("z")
    )
