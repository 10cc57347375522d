"""Scaling probe for the round-6 wave-13/14 operators: exact
Wasserstein drift, Mann-Whitney U, lexical diversity, KS drift, CMS
join-size estimation, and the n-gram coverage curve at 1x / 10x / 100x
their sf0.1 volumes.

Corpora are pure-codegen synthetics shaped like the real inputs
(orders-shaped rows with 1995..2001 dates and hash-spread prices;
orderkey streams with lineitem-like fan-out; the planted-duplicate
corpus with a source column). Every leg runs the EXACT registered
code path (workload.wave13/wave14 *_frame bodies).

Expected shapes: wasserstein / ks / mann_whitney aggregate BY VALUE
first, so their windows run over the bounded dollar/cent SUPPORT —
wall should track the support, not the row count, until the support
saturates (dollar domain ~600k, cent domain ~60M). join_size folds to
two fixed 4x2048 sketches (the exact leg's key-count join is the only
data-sized stage). lexical_diversity / ngram_coverage are
vocabulary-bounded after one explode.

Usage: python tools/scale_wave13_probe.py [--scales=1,10,100]
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
from etl_neotel_sql_automation_spark.workload.wave13 import (
    lexical_diversity_frame,
    mann_whitney_frame,
    wasserstein_frame,
)
from etl_neotel_sql_automation_spark.workload.wave14 import (
    join_size_estimate_frame,
    ks_drift_frame,
    ngram_coverage_frame,
)
from scale_wave12_probe import synth_documents, synth_orders

BASE_ORDERS = 150_000
BASE_CUSTS = 15_000
BASE_LINES = 600_000
BASE_DOCS = 5_000


def synth_keys(spark: SparkSession, n: int, n_keys: int, salt: str) -> DataFrame:
    return spark.range(n).select(
        F.pmod(F.xxhash64(F.lit(salt), "id"), F.lit(n_keys)).alias("k")
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
        app_name="scale_wave13_probe", master="local[32]", shuffle_partitions=32
    )
    for n in scales:
        orders = synth_orders(spark, BASE_ORDERS * n, BASE_CUSTS * n)
        # priority column for mann_whitney (synth_orders has none)
        orders_p = orders.withColumn(
            "o_orderpriority",
            F.when(
                F.pmod(F.xxhash64(F.lit("pr"), "o_orderkey"), F.lit(5)) == 0,
                "1-URGENT",
            ).otherwise("3-MEDIUM"),
        )
        ka = synth_keys(spark, BASE_ORDERS * n, BASE_ORDERS * n, "a")
        kb = synth_keys(spark, BASE_LINES * n, BASE_ORDERS * n, "b")
        docs = synth_documents(spark, BASE_DOCS * n)
        legs: dict = {}
        res = {"scale": n, "orders": BASE_ORDERS * n, "lines": BASE_LINES * n,
               "docs": BASE_DOCS * n}
        legs["wasserstein"] = run(f"wasserstein {n}x", wasserstein_frame(orders))
        legs["ks_drift"] = run(f"ks_drift {n}x", ks_drift_frame(orders))
        legs["mann_whitney"] = run(
            f"mann_whitney {n}x", mann_whitney_frame(orders_p)
        )
        legs["join_size"] = run(
            f"join_size {n}x", join_size_estimate_frame(ka, kb)
        )
        legs["lexical_diversity"] = run(
            f"lexical_diversity {n}x", lexical_diversity_frame(docs)
        )
        legs["ngram_coverage"] = run(
            f"ngram_coverage {n}x", ngram_coverage_frame(docs)
        )
        record("wave13", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
