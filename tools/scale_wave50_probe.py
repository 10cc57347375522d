"""Scale probe for the round-8 waves 50-57 frames (1x/10x/100x
synthetic inputs — the wave-31/12 generators, so the numbers sit
beside the existing SCALING.md family rows).

Usage: python tools/scale_wave50_probe.py [--scales=1,10,100]
Writes one JSON line per (family, scale) to stdout.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave50 import anova_frame
from etl_neotel_sql_automation_spark.workload.wave51 import roc_auc_frame
from etl_neotel_sql_automation_spark.workload.wave52 import ols_frame
from etl_neotel_sql_automation_spark.workload.wave53 import cross_corr_frame
from etl_neotel_sql_automation_spark.workload.wave54 import isotonic_frame
from etl_neotel_sql_automation_spark.workload.wave55 import pacf_frame
from etl_neotel_sql_automation_spark.workload.wave56 import qini_frame
from etl_neotel_sql_automation_spark.workload.wave57 import elasticity_frame
from etl_neotel_sql_automation_spark.workload.wave58 import tukey_frame
from etl_neotel_sql_automation_spark.workload.wave59 import (
    energy_distance_frame,
)
from etl_neotel_sql_automation_spark.workload.wave60 import (
    permutation_test_frame,
)
from etl_neotel_sql_automation_spark.workload.wave62 import ips_frame
from etl_neotel_sql_automation_spark.workload.wave63 import cluster_se_frame
from etl_neotel_sql_automation_spark.workload.wave64 import heaps_frame
from etl_neotel_sql_automation_spark.workload.wave65 import within_frame
from etl_neotel_sql_automation_spark.workload.wave66 import dispersion_frame
from etl_neotel_sql_automation_spark.workload.wave68 import littles_frame
from etl_neotel_sql_automation_spark.workload.wave69 import (
    event_study_frame,
)
from etl_neotel_sql_automation_spark.workload.wave70 import bh_fdr_frame
from etl_neotel_sql_automation_spark.workload.wave71 import (
    capture_recapture_frame,
)
from etl_neotel_sql_automation_spark.workload.wave72 import neyman_frame
from tools.scale_wave12_probe import synth_documents
from tools.scale_wave31_probe import synth_events, synth_orders_like

from pyspark.sql import functions as F

import time


def run(label, mk_frame):
    """Time CONSTRUCT + EXEC: the wave-53/54/55 frames localCheckpoint
    their bounded intermediates eagerly at construction, so timing
    only the post-construction noop write would hide the heavy pass.
    ``mk_frame`` is a zero-arg constructor."""
    t0 = time.perf_counter()
    mk_frame().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return dt


def synth_corr_star(spark, n_orders: int):
    """(orders, customer, nation) star with the NATION_k names the
    cross-correlation frame filters on, plus a price column."""
    orders = synth_orders_like(spark, n_orders).withColumn(
        "o_totalprice",
        (F.pmod(F.xxhash64(F.lit("p"), "o_orderkey"), F.lit(900_000)) + 1)
        / 100.0,
    )
    cust = spark.range(15_000).select(
        F.col("id").alias("c_custkey"),
        F.pmod("id", F.lit(25)).alias("c_nationkey"),
    )
    nation = spark.range(25).select(
        F.col("id").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
    )
    return orders, cust, nation


def synth_lineitem(spark, n_rows: int):
    """lineitem-shaped rows with a p_brand column (25 brands), integral
    quantities 1..50, discounts 0..9%, and a noisy power-law-ish
    price — the inputs the OLS and elasticity frames read."""
    qty = F.pmod(F.xxhash64(F.lit("q"), "id"), F.lit(50)) + 1
    disc = F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(10))
    unit = F.pmod(F.xxhash64(F.lit("u"), "id"), F.lit(9_000)) + 1_000
    return spark.range(n_rows).select(
        qty.cast("double").alias("l_quantity"),
        (disc / 100.0).alias("l_discount"),
        (qty * unit / 100.0).alias("l_extendedprice"),
        F.concat(
            F.lit("Brand#"), F.pmod(F.xxhash64(F.lit("b"), "id"), F.lit(25))
        ).alias("p_brand"),
    )


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    # one session per family (the wave-41 probe lesson: checkpoint
    # blocks of a 20M-row synthetic pin the heap across families)
    for family in ("events", "docs", "orders", "lineitem"):
        spark = get_spark(
            app_name=f"scale_wave50_probe_{family}", master="local[32]",
            shuffle_partitions=32,
        )
        for n in scales:
            legs: dict = {}
            res = {"family": family, "scale": n}
            if family == "events":
                ev = synth_events(spark, 200_000 * n).localCheckpoint()
                res["events"] = 200_000 * n
                legs["anova_f"] = run(f"anova_f {n}x", lambda: anova_frame(ev))
                legs["qini"] = run(f"qini {n}x", lambda: qini_frame(ev))
                legs["tukey"] = run(f"tukey {n}x", lambda: tukey_frame(ev))
                legs["permutation"] = run(
                    f"permutation {n}x", lambda: permutation_test_frame(ev)
                )
                legs["ips"] = run(f"ips {n}x", lambda: ips_frame(ev))
                legs["cluster_se"] = run(
                    f"cluster_se {n}x", lambda: cluster_se_frame(ev)
                )
                legs["event_study"] = run(
                    f"event_study {n}x", lambda: event_study_frame(ev)
                )
                legs["bh_fdr"] = run(
                    f"bh_fdr {n}x", lambda: bh_fdr_frame(ev)
                )
                legs["neyman"] = run(
                    f"neyman {n}x", lambda: neyman_frame(ev)
                )
            elif family == "docs":
                docs = synth_documents(spark, 5_000 * n).localCheckpoint()
                res["docs"] = 5_000 * n
                legs["roc_auc"] = run(f"roc_auc {n}x", lambda: roc_auc_frame(docs))
                legs["isotonic"] = run(
                    f"isotonic {n}x", lambda: isotonic_frame(docs)
                )
                legs["heaps"] = run(f"heaps {n}x", lambda: heaps_frame(docs))
                legs["dispersion"] = run(
                    f"dispersion {n}x", lambda: dispersion_frame(docs)
                )
                # heaviest leg: ~96 s at 100x on a dedicated run —
                # give it its own invocation when sweeping all scales
                legs["capture_recapture"] = run(
                    f"capture_recapture {n}x",
                    lambda: capture_recapture_frame(docs),
                )
            elif family == "orders":
                orders, cust, nation = synth_corr_star(spark, 60_000 * n)
                orders = orders.localCheckpoint()
                res["orders"] = 60_000 * n
                legs["cross_corr"] = run(
                    f"cross_corr {n}x",
                    lambda: cross_corr_frame(orders, cust, nation),
                )
                legs["pacf"] = run(f"pacf {n}x", lambda: pacf_frame(orders))
                legs["littles"] = run(
                    f"littles {n}x",
                    lambda: littles_frame(
                        orders.select(
                            "o_orderkey",
                            F.col("o_orderdate").cast("date").alias(
                                "o_orderdate"
                            ),
                        ),
                        orders.select(
                            F.col("o_orderkey").alias("l_orderkey"),
                            F.date_add(
                                F.col("o_orderdate").cast("date"),
                                F.pmod(
                                    F.xxhash64(F.lit("sh"), "o_orderkey"),
                                    F.lit(30),
                                ).cast("int"),
                            ).alias("l_shipdate"),
                        ),
                    ),
                )
                legs["energy"] = run(
                    f"energy {n}x",
                    lambda: energy_distance_frame(
                        orders.withColumn(
                            "o_orderpriority",
                            F.when(
                                F.pmod(
                                    F.xxhash64(F.lit("pr"), "o_orderkey"),
                                    F.lit(2),
                                )
                                == 0,
                                "1-URGENT",
                            ).otherwise("5-LOW"),
                        )
                    ),
                )
            else:
                li = synth_lineitem(spark, 240_000 * n).localCheckpoint()
                res["lineitem"] = 240_000 * n
                legs["ols"] = run(f"ols {n}x", lambda: ols_frame(li))
                legs["elasticity"] = run(
                    f"elasticity {n}x", lambda: elasticity_frame(li)
                )
                legs["within"] = run(
                    f"within {n}x",
                    lambda: within_frame(
                        li.withColumn(
                            "l_suppkey",
                            F.pmod(F.xxhash64(F.lit("s"), "l_quantity",
                                              "l_extendedprice"),
                                   F.lit(1_000)),
                        )
                    ),
                )
            record("wave50", res["scale"], legs)
            print(json.dumps({**res, **legs}), flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
