"""Scaling probe for the round-6 wave-15 operators: OOV rate,
sequential-gap audit, inter-arrival quartiles, and dedup impact at
1x / 10x / 100x their sf0.1 volumes. Every leg runs the EXACT
registered code path (workload.wave15 *_frame bodies) over the same
synthetics the wave-12/13 probes use.

Expected shapes: oov is tokenize + a K-bounded vocab join; gaps is one
aggregate; quartiles collapse to the gap-day support (~2400 values);
dedup impact is two combinable aggregates over fingerprints — all
should be flat-to-sublinear except the tokenize CPU itself.

Usage: python tools/scale_wave15_probe.py [--scales=1,10,100]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave15 import (
    dedup_impact_frame,
    interarrival_quartiles_frame,
    oov_rate_frame,
    sequential_gaps_frame,
)
from scale_wave12_probe import synth_documents, synth_orders

BASE_ORDERS = 150_000
BASE_CUSTS = 15_000
BASE_DOCS = 5_000


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
        app_name="scale_wave15_probe", master="local[32]", shuffle_partitions=32
    )
    for n in scales:
        orders = synth_orders(spark, BASE_ORDERS * n, BASE_CUSTS * n)
        docs = synth_documents(spark, BASE_DOCS * n)
        legs: dict = {}
        res = {"scale": n, "orders": BASE_ORDERS * n, "docs": BASE_DOCS * n}
        legs["oov_rate"] = run(f"oov_rate {n}x", oov_rate_frame(docs))
        legs["sequential_gaps"] = run(
            f"sequential_gaps {n}x", sequential_gaps_frame(orders)
        )
        legs["interarrival"] = run(
            f"interarrival {n}x", interarrival_quartiles_frame(orders)
        )
        legs["dedup_impact"] = run(f"dedup_impact {n}x", dedup_impact_frame(docs))
        record("wave15", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
