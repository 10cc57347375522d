"""Scaling probe for the round-6 wave-16/17/18 operators: water-filling
allocation, RFM migration, Spearman, Kruskal-Wallis, nation
modularity, coding length, the referential-orphan audit, embedding
anisotropy, and the Holt fold at 1x / 10x / 100x their sf0.1 volumes.
Every leg runs the EXACT registered code path (workload.wave16/17/18
*_frame bodies) over the same synthetics the wave-12/13/15 probes use.

Expected shapes: water-filling and coding length are tokenize passes
into source-bounded aggregates; RFM migration is one per-customer
aggregate into a 16-cell matrix; Spearman/Kruskal windows run over the
bounded value SUPPORT (cents), which approaches the row count until the
price domain saturates (the Mann-Whitney precedent — the documented
bound); modularity is a distinct-pair aggregate plus two nation-keyed
combinable aggregates.

Usage: python tools/scale_wave17_probe.py [--scales=1,10,100]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave16 import (
    rfm_migration_frame,
    water_filling_frame,
)
from etl_neotel_sql_automation_spark.workload.wave17 import (
    coding_length_frame,
    kruskal_wallis_frame,
    modularity_frame,
    spearman_frame,
)
from etl_neotel_sql_automation_spark.workload.wave18 import (
    anisotropy_frame,
    holt_linear_frame,
    referential_orphans_frame,
)
from etl_neotel_sql_automation_spark.workload.wave19 import (
    greedy_knapsack_frame,
    seasonal_decompose_frame,
    sensitivity_audit_frame,
    theil_frame,
)
from etl_neotel_sql_automation_spark.workload.wave20 import (
    best_split_frame,
    cuped_frame,
    hill_frame,
    power_mde_frame,
)
from etl_neotel_sql_automation_spark.workload.wave21 import (
    duplicate_payments_frame,
    funnel_latency_frame,
    pchart_frame,
)
from etl_neotel_sql_automation_spark.workload.wave22 import (
    seasonal_anomaly_frame,
)
from etl_neotel_sql_automation_spark.workload.wave23 import (
    markov_stationary_frame,
)
from etl_neotel_sql_automation_spark.workload.wave31 import (
    pr_curve_frame,
    rank_metrics_frame,
)
from etl_neotel_sql_automation_spark.workload.wave24 import (
    binary_rerank_frame,
    pareto_nbd_frame,
)
from etl_neotel_sql_automation_spark.workload.wave25 import (
    nrr_frame,
    scorecard_frame,
    stickiness_frame,
)
from etl_neotel_sql_automation_spark.workload.wave26 import (
    sprt_frame,
    weekday_concentration_frame,
)
from etl_neotel_sql_automation_spark.workload.wave27 import (
    contrastive_pairs_frame,
    rolling_median_frame,
)
from etl_neotel_sql_automation_spark.workload.wave29 import (
    mlm_masking_frame,
    pvm_frame,
)
from scale_wave12_probe import synth_documents, synth_orders

BASE_ORDERS = 150_000
BASE_CUSTS = 15_000
BASE_SUPPS = 1_500
BASE_LINES = 600_000
BASE_DOCS = 5_000

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECI", "5-LOW"]


def synth_orders_prio(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    prios = F.array(*[F.lit(p) for p in _PRIOS])
    return synth_orders(spark, n, n_cust).withColumn(
        "o_orderpriority",
        F.element_at(
            prios,
            (F.pmod(F.xxhash64(F.lit("q"), "o_orderkey"), F.lit(5)) + 1).cast(
                "int"
            ),
        ),
    )


def synth_lineitem_qty(spark: SparkSession, n: int, n_supp: int) -> DataFrame:
    return spark.range(n).select(
        (F.col("id") % (n // 4 + 1)).alias("l_orderkey"),
        F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(n_supp)).alias("l_suppkey"),
        (F.pmod(F.xxhash64(F.lit("n"), "id"), F.lit(50)) + 1)
        .cast("double")
        .alias("l_quantity"),
        (
            F.pmod(F.xxhash64(F.lit("e"), "id"), F.lit(10_000_000)) / 100.0
            + 900.0
        ).alias("l_extendedprice"),
    )


def synth_keyed_nation(
    spark: SparkSession, n: int, key: str, nat: str
) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias(key),
        F.pmod(F.xxhash64(F.lit("n"), "id"), F.lit(25)).cast("int").alias(nat),
    )


def run(label: str, df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return dt


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        app_name="scale_wave17_probe", master="local[32]", shuffle_partitions=32
    )
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("N"), F.col("id")).alias("n_name"),
    )
    for n in scales:
        orders = synth_orders_prio(spark, BASE_ORDERS * n, BASE_CUSTS * n)
        li = synth_lineitem_qty(spark, BASE_LINES * n, BASE_SUPPS * n)
        docs = synth_documents(spark, BASE_DOCS * n)
        cust = synth_keyed_nation(
            spark, BASE_CUSTS * n, "c_custkey", "c_nationkey"
        )
        supp = synth_keyed_nation(
            spark, BASE_SUPPS * n, "s_suppkey", "s_nationkey"
        )
        legs: dict = {}
        res = {"scale": n, "orders": BASE_ORDERS * n, "lines": BASE_LINES * n,
               "docs": BASE_DOCS * n}
        legs["water_filling"] = run(
            f"water_filling {n}x", water_filling_frame(docs)
        )
        legs["rfm_migration"] = run(
            f"rfm_migration {n}x", rfm_migration_frame(orders)
        )
        legs["spearman"] = run(f"spearman {n}x", spearman_frame(li))
        legs["kruskal"] = run(f"kruskal {n}x", kruskal_wallis_frame(orders))
        legs["modularity"] = run(
            f"modularity {n}x", modularity_frame(orders, li, cust, supp, nation)
        )
        legs["coding_length"] = run(
            f"coding_length {n}x", coding_length_frame(docs)
        )
        # wave-18 legs: the orphan audit over the 4 heavy edges the
        # synthetics model (lineitem->orders/supplier, orders->customer,
        # customer/supplier->nation via the keyed synthetics)
        part = spark.range(BASE_SUPPS * n).selectExpr("id AS p_partkey")
        li_fk = li.withColumn(
            "l_partkey", F.pmod(F.xxhash64(F.lit("p"), "l_orderkey"),
                                F.lit(BASE_SUPPS * n))
        )
        nation_fk = nation.withColumn("n_regionkey", F.lit(0).cast("int"))
        region = spark.range(1).selectExpr("CAST(id AS INT) AS r_regionkey")
        legs["orphans"] = run(
            f"orphans {n}x",
            referential_orphans_frame(
                {
                    "lineitem": li_fk,
                    "orders": orders.withColumnRenamed("id", "o_orderkey"),
                    "part": part,
                    "supplier": supp,
                    "customer": cust,
                    "nation": nation_fk,
                    "region": region,
                }
            ),
        )
        emb = spark.range(60_000 * n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    F.pmod(F.xxhash64(F.lit("v"), F.col("id"), i), F.lit(200))
                    - 100
                ).cast("double")
                / 100.0,
            )
            .cast("array<float>")
            .alias("embedding"),
        )
        legs["anisotropy"] = run(f"anisotropy {n}x", anisotropy_frame(emb))
        legs["holt"] = run(f"holt {n}x", holt_linear_frame(orders))
        # wave-19 legs
        legs["knapsack"] = run(f"knapsack {n}x", greedy_knapsack_frame(docs))
        legs["sensitivity"] = run(
            f"sensitivity {n}x", sensitivity_audit_frame(orders)
        )
        legs["theil"] = run(
            f"theil {n}x",
            theil_frame(
                orders, cust.withColumn("c_name", F.lit("c"))
            ),
        )
        legs["seasonal"] = run(
            f"seasonal {n}x", seasonal_decompose_frame(orders)
        )
        # wave-20 legs: events-shaped synthetic for the experimentation
        # pair; orders for the tail/changepoint pair
        ev = spark.range(BASE_ORDERS * n).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (
                    F.lit(1_704_067_200)  # 2024-01-01 UTC
                    + F.pmod(F.xxhash64(F.lit("t"), "id"), F.lit(30 * 86_400))
                )
                * 1_000_000
            ).alias("ts"),
            F.pmod(F.xxhash64(F.lit("u"), "id"), F.lit(BASE_CUSTS * n)).alias(
                "user_id"
            ),
            F.when(
                F.pmod(F.xxhash64(F.lit("e"), "id"), F.lit(5)) == 0, "purchase"
            )
            .otherwise("view")
            .alias("event_type"),
            (F.pmod(F.xxhash64(F.lit("v"), "id"), F.lit(30_000)) / 100.0).alias(
                "value"
            ),
        )
        legs["cuped"] = run(f"cuped {n}x", cuped_frame(ev))
        legs["power_mde"] = run(f"power_mde {n}x", power_mde_frame(ev))
        legs["hill"] = run(f"hill {n}x", hill_frame(orders))
        legs["best_split"] = run(f"best_split {n}x", best_split_frame(orders))
        # wave-21/22/23/24 legs: the events synthetic needs purchase
        # AND signup types for the funnel; lineitem needs flags/dates
        # for the p-chart
        ev2 = ev.withColumn(
            "event_type",
            F.when(
                F.pmod(F.xxhash64(F.lit("e2"), "event_id"), F.lit(10)) == 0,
                "signup",
            ).otherwise(F.col("event_type")),
        )
        li_pc = li.withColumn(
            "l_returnflag",
            F.when(
                F.pmod(F.xxhash64(F.lit("rf"), "l_orderkey"), F.lit(10)) == 0,
                "R",
            ).otherwise("N"),
        ).withColumn(
            "l_shipdate",
            F.timestamp_micros(
                (
                    F.lit(820_454_400)  # 1996-01-01 UTC
                    + F.pmod(
                        F.xxhash64(F.lit("sd"), "l_orderkey"),
                        F.lit(2190 * 86_400),
                    )
                )
                * 1_000_000
            ),
        )
        legs["dup_payments"] = run(
            f"dup_payments {n}x", duplicate_payments_frame(orders)
        )
        legs["pchart"] = run(f"pchart {n}x", pchart_frame(li_pc))
        legs["funnel_latency"] = run(
            f"funnel_latency {n}x", funnel_latency_frame(ev2)
        )
        legs["seasonal_anomaly"] = run(
            f"seasonal_anomaly {n}x", seasonal_anomaly_frame(orders)
        )
        legs["markov"] = run(f"markov {n}x", markov_stationary_frame(ev))
        legs["binary_rerank"] = run(
            f"binary_rerank {n}x", binary_rerank_frame(emb)
        )
        legs["pareto_nbd"] = run(f"pareto_nbd {n}x", pareto_nbd_frame(orders))
        # wave-25/26/27/29 legs
        legs["nrr"] = run(f"nrr {n}x", nrr_frame(orders))
        legs["scorecard"] = run(
            f"scorecard {n}x",
            scorecard_frame(
                li_pc.withColumn(
                    "l_extendedprice",
                    (F.pmod(F.xxhash64(F.lit("xp"), "l_orderkey"),
                            F.lit(1_000_000)) / 100.0),
                )
            ),
        )
        legs["stickiness"] = run(f"stickiness {n}x", stickiness_frame(ev))
        legs["sprt"] = run(f"sprt {n}x", sprt_frame(ev))
        legs["weekday_mix"] = run(
            f"weekday_mix {n}x", weekday_concentration_frame(orders)
        )
        legs["contrastive"] = run(
            f"contrastive {n}x", contrastive_pairs_frame(docs)
        )
        legs["rolling_median"] = run(
            f"rolling_median {n}x", rolling_median_frame(orders)
        )
        legs["pvm"] = run(f"pvm {n}x", pvm_frame(orders))
        legs["mlm_masking"] = run(f"mlm_masking {n}x", mlm_masking_frame(docs))
        # wave-31 legs: metric layers over the rerank path (the added
        # work vs binary_rerank is one 50-row join + a 10-row window)
        legs["rank_metrics"] = run(
            f"rank_metrics {n}x", rank_metrics_frame(emb)
        )
        legs["pr_curve"] = run(f"pr_curve {n}x", pr_curve_frame(emb))
        record("wave17", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
