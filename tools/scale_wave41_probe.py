"""Scale probe for the r8 wave-41 composed experiment pipeline
(1x/10x/100x synthetic events — the wave-31 generator, so the numbers
sit beside the existing SCALING.md event-family rows).

Usage: python tools/scale_wave41_probe.py [--scales=1,10,100]
Writes one JSON line per scale to stdout (redirect to a file).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave41 import (
    experiment_pipeline_frame,
)
from etl_neotel_sql_automation_spark.workload.wave42 import (
    did_frame,
    srm_frame,
)
from etl_neotel_sql_automation_spark.workload.wave43 import (
    split_leakage_frame,
)
from etl_neotel_sql_automation_spark.workload.wave44 import (
    dedup_threshold_sweep_frame,
)
from etl_neotel_sql_automation_spark.workload.wave45 import (
    reconcile_hierarchy_frame,
)
from etl_neotel_sql_automation_spark.workload.wave46 import (
    conformal_bounds_frame,
)
from tools.scale_wave12_probe import synth_documents
from tools.scale_wave17_probe import run
from tools.scale_wave31_probe import synth_events, synth_orders_like

from pyspark.sql import functions as F


def synth_star(spark, n_orders: int):
    """(orders, customer, nation, region) star for the reconciliation
    probe: the wave-31 synthetic orders plus a price column, 15k
    customers over 25 nations over 5 regions."""
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
        F.concat(F.lit("N"), F.col("id")).alias("n_name"),
        F.pmod("id", F.lit(5)).alias("n_regionkey"),
    )
    region = spark.range(5).select(
        F.col("id").alias("r_regionkey"),
        F.concat(F.lit("R"), F.col("id")).alias("r_name"),
    )
    return orders, cust, nation, region


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    # one session PER FAMILY: the localCheckpoint blocks of a 20M-row
    # synthetic pin the shared local-mode heap until the session ends,
    # and the accumulated blocks starved the next family's broadcast
    # build at 100x (measured: 'Not enough memory to build and
    # broadcast'); a fresh session drops every block deterministically
    for family in ("events", "docs", "star"):
        spark = get_spark(
            app_name=f"scale_wave41_probe_{family}", master="local[32]",
            shuffle_partitions=32,
        )
        for n in scales:
            legs: dict = {}
            res = {"family": family, "scale": n}
            if family == "events":
                ev = synth_events(spark, 200_000 * n).localCheckpoint()
                res["events"] = 200_000 * n
                legs["experiment_e2e"] = run(
                    f"experiment_e2e {n}x", experiment_pipeline_frame(ev)
                )
                legs["srm"] = run(f"srm {n}x", srm_frame(ev))
                legs["did"] = run(f"did {n}x", did_frame(ev))
            elif family == "docs":
                docs = synth_documents(spark, 5_000 * n).localCheckpoint()
                res["docs"] = 5_000 * n
                legs["split_leakage"] = run(
                    f"split_leakage {n}x", split_leakage_frame(docs)
                )
                legs["threshold_sweep"] = run(
                    f"threshold_sweep {n}x",
                    dedup_threshold_sweep_frame(docs),
                )
                legs["conformal"] = run(
                    f"conformal {n}x", conformal_bounds_frame(docs)
                )
            else:
                orders, cust, nation, region = synth_star(
                    spark, 60_000 * n
                )
                res["orders"] = 60_000 * n
                legs["reconcile"] = run(
                    f"reconcile {n}x",
                    reconcile_hierarchy_frame(orders, cust, nation, region),
                )
            record("wave41", res["scale"], legs)
            print(json.dumps({**res, **legs}), flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
