"""Scaling probe for the round-6 wave-4 operators: inverted-index
construction, cross-source quantile normalization, Resource-Allocation
link prediction, and seed-deterministic epoch shuffling at
1x / 10x / 100x their sf0.1 volumes.

Corpora are pure-codegen synthetics: documents reuse
scale_dedup_probe.synth_docs (with a 20-source column planted for the
quantile map), the bipartite purchase pairs come off spark.range with
sf0.1-shaped degrees. Every leg runs the EXACT registered code path
(workload.wave7.*_frame bodies).

Usage: python tools/scale_wave7_probe.py [--scales=1,10,100]
Prints one JSON line per scale; committed numbers live in SCALING.md.
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
from etl_neotel_sql_automation_spark.workload.wave7 import (
    epoch_shuffle_frame,
    inverted_index_frame,
    link_predict_frame,
    quantile_normalize_frame,
)
from scale_dedup_probe import synth_docs

BASE_DOCS = 5_000    # sf0.1 documents volume
BASE_CUSTS = 15_000  # sf0.1 customer population
BASE_SUPPS = 1_000   # sf0.1 supplier population
BASE_PAIRS = 50_000  # ~sf0.1 distinct (cust, supp) purchase pairs
N_SOURCES = 20


def synth_sourced_docs(spark: SparkSession, n: int) -> DataFrame:
    return synth_docs(spark, n).withColumn(
        "source", F.concat(F.lit("src"), F.col("doc_id") % N_SOURCES)
    )


def synth_pairs(spark: SparkSession, n_pairs: int, n_cust: int, n_supp: int) -> DataFrame:
    """Distinct (c, s) purchase pairs with both populations scaling so
    supplier degree stays in the sf0.1 band (~50 buyers/supplier) —
    the regime where the probe cohort's candidate fan-out is the
    realistic one."""
    return (
        spark.range(n_pairs)
        .select(
            F.pmod(F.xxhash64(F.lit("c"), "id"), F.lit(n_cust)).alias("c"),
            F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(n_supp)).alias("s"),
        )
        .distinct()
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
    spark = get_spark(app_name="scale_wave7_probe", master="local[32]",
                      shuffle_partitions=32)
    for n in scales:
        docs = synth_sourced_docs(spark, BASE_DOCS * n)
        pairs = synth_pairs(spark, BASE_PAIRS * n, BASE_CUSTS * n, BASE_SUPPS * n)
        legs: dict = {}
        res = {"scale": n, "docs": BASE_DOCS * n, "pairs": BASE_PAIRS * n}
        legs["inverted_index"] = run(f"inverted_index {n}x", inverted_index_frame(docs))
        legs["quantile_normalize"] = run(
            f"quantile_normalize {n}x", quantile_normalize_frame(docs)
        )
        legs["link_predict"] = run(f"link_predict {n}x", link_predict_frame(pairs))
        legs["epoch_shuffle"] = run(f"epoch_shuffle {n}x", epoch_shuffle_frame(docs))
        record("wave7", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
