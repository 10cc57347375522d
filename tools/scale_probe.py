"""Scale probe: how do the headline plans behave when the data grows?

Unions N copies of the sf0.1 fact tables in-memory (keys offset per
copy so cardinalities scale too) and times representative queries at
1x vs Nx, printing the scaling ratio. Linear-ish ratios + unchanged
plan shapes (broadcasts still broadcast) are the pass signal.

Also measures the HOF-expression cosine vs the Arrow/numpy Pandas UDF
on a widened corpus — the documented vectorized-UDF tradeoff.

Usage: python tools/scale_probe.py [N_copies]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark import workload
from etl_neotel_sql_automation_spark.ops import similarity as S
from etl_neotel_sql_automation_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SF = "/root/testdata/sf0.1"


def widen(df: DataFrame, key_cols: list[str], n: int, stride: int = 10_000_000) -> DataFrame:
    out = None
    for i in range(n):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + i * stride)
        out = c if out is None else out.unionByName(c)
    return out


def run(label: str, df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return dt


def main() -> None:
    spark = get_spark(app_name="scale_probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    li = workload.table(spark, SF, "lineitem")
    orders = workload.table(spark, SF, "orders")
    cust = workload.table(spark, SF, "customer")

    li_n = widen(li, ["l_orderkey"], N)
    orders_n = widen(orders, ["o_orderkey", "o_custkey"], N)

    def q1(df: DataFrame) -> DataFrame:
        dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum(dp), F.avg("l_extendedprice"), F.count("*")
        )

    def join_agg(l: DataFrame, o: DataFrame) -> DataFrame:  # noqa: E741
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        )

    print(f"== scan+agg (q1 shape), 1x vs {N}x ==")
    t1 = run("1x", q1(li))
    tn = run(f"{N}x", q1(li_n))
    print(f"  ratio {tn / t1:.1f} (copies={N})")

    print(f"== fact-fact join+agg, 1x vs {N}x ==")
    t1 = run("1x", join_agg(li, orders))
    tn = run(f"{N}x", join_agg(li_n, orders_n))
    print(f"  ratio {tn / t1:.1f}")

    print("== broadcast survival at Nx ==")
    jplan = (
        li_n.join(F.broadcast(cust), li_n.l_suppkey == cust.c_custkey)
        ._jdf.queryExecution().executedPlan().toString()
    )
    print("  broadcast kept:", "BroadcastHashJoin" in jplan)

    print("== cosine: HOF expression vs Arrow/numpy pandas UDF ==")
    emb = workload.table(spark, SF, "embeddings")
    wide = None
    for i in range(50):  # 100k vectors
        c = emb.withColumn("vec_id", F.col("vec_id") + i * 1_000_000)
        wide = c if wide is None else wide.unionByName(c)
    wide = wide.repartition(32).cache()
    wide.count()
    qv = [float(x) for x in emb.first().embedding]
    t0 = time.perf_counter()
    wide.select(S.cosine(F.lit(None).cast("array<double>") if False else "embedding",
                         F.array(*[F.lit(x) for x in qv]).cast("array<double>")).alias("s")) \
        .write.mode("overwrite").format("noop").save()
    t_hof = time.perf_counter() - t0
    t0 = time.perf_counter()
    wide.select(S.cosine_to_fixed_pandas(qv).alias("s")) \
        .write.mode("overwrite").format("noop").save()
    t_pd = time.perf_counter() - t0
    print(f"  HOF expr: {t_hof:.2f}s | pandas UDF: {t_pd:.2f}s | speedup {t_hof / t_pd:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
