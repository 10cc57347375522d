"""One-off r12 measurement probe for agg_approx_stats (guide §1):
time the current form and candidate restructures in ONE warmed
session, checking output equality against the current form at the
probe SF. Not part of the bench; numbers land in OPTIMIZATION_r12.md.

Usage: python tools/probe_agg_approx.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload import table


def current(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("l_orderkey").alias("ad"),
            F.countDistinct("l_orderkey").alias("ed"),
            F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95))").alias("ap"),
            F.expr("percentile(l_extendedprice, array(0.45, 0.55, 0.90, 0.99))").alias("e"),
        )
        .select(
            "l_returnflag",
            "n",
            (F.abs(F.col("ad") - F.col("ed")) <= F.col("ed") * 0.1).alias("distinct_ok"),
            F.element_at("ap", 1).between(F.element_at("e", 1), F.element_at("e", 2)).alias("p50_ok"),
            F.element_at("ap", 2).between(F.element_at("e", 3), F.element_at("e", 4)).alias("p95_ok"),
        )
    )


def no_exact_distinct(spark, sf_dir):
    """Variant A: exact distinct via a two-level aggregation joined
    back (removes the Expand duplication of every row)."""
    li = table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.approx_count_distinct("l_orderkey").alias("ad"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95))").alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.45, 0.55, 0.90, 0.99))").alias("e"),
    )
    ed = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("ed"))
    )
    return base.join(ed, "l_returnflag").select(
        "l_returnflag",
        "n",
        (F.abs(F.col("ad") - F.col("ed")) <= F.col("ed") * 0.1).alias("distinct_ok"),
        F.element_at("ap", 1).between(F.element_at("e", 1), F.element_at("e", 2)).alias("p50_ok"),
        F.element_at("ap", 2).between(F.element_at("e", 3), F.element_at("e", 4)).alias("p95_ok"),
    )


def freq_percentile(spark, sf_dir):
    """Variant B: A + exact percentile fed the per-(flag, price) count
    frame through percentile's frequency argument."""
    li = table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.approx_count_distinct("l_orderkey").alias("ad"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95))").alias("ap"),
    )
    ed = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("ed"))
    )
    ex = (
        li.groupBy("l_returnflag", "l_extendedprice")
        .agg(F.count("*").alias("freq"))
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.45, 0.55, 0.90, 0.99), freq)"
            ).alias("e")
        )
    )
    return (
        base.join(ed, "l_returnflag")
        .join(ex, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            (F.abs(F.col("ad") - F.col("ed")) <= F.col("ed") * 0.1).alias("distinct_ok"),
            F.element_at("ap", 1).between(F.element_at("e", 1), F.element_at("e", 2)).alias("p50_ok"),
            F.element_at("ap", 2).between(F.element_at("e", 3), F.element_at("e", 4)).alias("p95_ok"),
        )
    )


def isolate(tag, make_exprs):
    """Single-aggregate isolation legs: which aggregate costs what.
    ``make_exprs`` is a thunk — Columns need a live SparkContext."""

    def fn(spark, sf_dir):
        li = table(spark, sf_dir, "lineitem")
        return li.groupBy("l_returnflag").agg(*make_exprs())

    fn.__name__ = tag
    return fn


VARIANTS = {
    "current": current,
    "no_exact_distinct": no_exact_distinct,
    "freq_percentile": freq_percentile,
    "only_count": isolate("only_count", lambda: [F.count("*").alias("n")]),
    "only_hll": isolate(
        "only_hll", lambda: [F.approx_count_distinct("l_orderkey").alias("ad")]
    ),
    "only_exact_distinct": isolate(
        "only_exact_distinct", lambda: [F.countDistinct("l_orderkey").alias("ed")]
    ),
    "only_approx_pct": isolate(
        "only_approx_pct",
        lambda: [
            F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95))").alias("ap")
        ],
    ),
    "only_exact_pct": isolate(
        "only_exact_pct",
        lambda: [
            F.expr(
                "percentile(l_extendedprice, array(0.45, 0.55, 0.90, 0.99))"
            ).alias("e")
        ],
    ),
}


def main():
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    spark = get_spark(app_name="probe-agg-approx")
    # warm
    VARIANTS["current"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    out = {}
    ref = sorted(current(spark, sf_dir).collect())
    for name, fn in VARIANTS.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        row = {"best": round(best, 3)}
        if name in ("no_exact_distinct", "freq_percentile"):
            row["equal"] = sorted(fn(spark, sf_dir).collect()) == ref
        out[name] = row
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
