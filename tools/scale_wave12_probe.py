"""Scaling probe for the round-6 wave-12 meters: z-order layout
pruning, one-pass bootstrap CI, PSI drift, calibration/ECE, Cohen's
kappa, and info-gain ranking at 1x / 10x / 100x their sf0.1 volumes.

Corpora are pure-codegen synthetics shaped like the real inputs:
orders-shaped rows off spark.range (custkey population scales with
volume, dates spread uniformly over the real 1995..2001 span so the
PSI split and z-order day offsets exercise the registered literals),
lineitem-shaped (orderkey, returnflag) rows, and the planted-duplicate
corpus from scale_dedup_probe with lang/source columns and a
hash-variable stopword suffix appended (so the calibration score and
the info-gain label actually vary). Every leg runs the EXACT
registered code path (workload.wave12 *_frame bodies).

Expected shapes: psi / calibration / kappa / info_gain are one scan
plus a bounded-key combinable aggregate — sublinear on local cores.
bootstrap is a 64x explode whose aggregation is map-side combined —
linear CPU, constant shuffle. zorder_layout is the known exception:
the layout SIMULATION ranks globally (single-partition window), so it
scales linearly-to-superlinearly by construction; the registered
docstring prescribes running the meter on a hash-sample at 100 TB, and
this probe MEASURES what ignoring that advice costs.

Usage: python tools/scale_wave12_probe.py [--scales=1,10,100]
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
from etl_neotel_sql_automation_spark.workload.wave12 import (
    bootstrap_ci_frame,
    calibration_bins_frame,
    cohens_kappa_frame,
    info_gain_frame,
    psi_drift_frame,
    zorder_layout_frame,
)
from scale_dedup_probe import synth_docs

BASE_ORDERS = 150_000  # sf0.1 orders volume
BASE_CUSTS = 15_000
BASE_LINES = 600_000   # sf0.1 lineitem volume
BASE_DOCS = 5_000      # sf0.1 documents volume
_EPOCH_1995 = 788_918_400  # 1995-01-01 UTC, seconds
_DAY_SPAN = 2_404          # ..2001-08-01, matching the real span


def synth_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64(F.lit("c"), "id"), F.lit(n_cust)).alias("o_custkey"),
        (
            F.pmod(F.xxhash64(F.lit("p"), "id"), F.lit(30_000_000)) / 100.0
            + 900.0
        ).alias("o_totalprice"),
        F.timestamp_micros(
            (
                F.lit(_EPOCH_1995)
                + F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(_DAY_SPAN)) * 86_400
            )
            * 1_000_000
        ).alias("o_orderdate"),
    )


def synth_lineitem(spark: SparkSession, n: int) -> DataFrame:
    flags = F.array(F.lit("R"), F.lit("A"), F.lit("N"))
    return spark.range(n).select(
        (F.col("id") % (n // 4 + 1)).alias("l_orderkey"),
        F.element_at(flags, (F.pmod(F.xxhash64(F.lit("f"), "id"), F.lit(3)) + 1).cast("int")).alias(
            "l_returnflag"
        ),
    )


def synth_documents(spark: SparkSession, n_docs: int) -> DataFrame:
    """synth_docs plus the columns wave-12 reads: lang/source by hash,
    and a hash-variable stopword suffix so the stopword-ratio score
    (calibration) and the language label entropy (info gain) vary."""
    docs = synth_docs(spark, n_docs)
    stop_n = F.pmod(F.xxhash64(F.lit("s"), "doc_id"), F.lit(6))
    suffix = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), stop_n), lambda i: F.lit("the"))
    )
    return docs.select(
        "doc_id",
        F.concat_ws(" ", "text", suffix).alias("text"),
        F.when(F.pmod(F.xxhash64(F.lit("l"), "doc_id"), F.lit(10)) < 7, "en")
        .otherwise("es")
        .alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64(F.lit("g"), "doc_id"), F.lit(20))
        ).alias("source"),
        # the real documents table carries n_chars; consumers like
        # conformal_bounds_frame read it (the wave41 probe leg failed
        # without it)
        F.length(F.concat_ws(" ", "text", suffix)).cast("long").alias("n_chars"),
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
        app_name="scale_wave12_probe", master="local[32]", shuffle_partitions=32
    )
    for n in scales:
        orders = synth_orders(spark, BASE_ORDERS * n, BASE_CUSTS * n)
        li = synth_lineitem(spark, BASE_LINES * n)
        docs = synth_documents(spark, BASE_DOCS * n)
        legs: dict = {}
        res = {"scale": n, "orders": BASE_ORDERS * n, "lines": BASE_LINES * n,
               "docs": BASE_DOCS * n}
        legs["psi_drift"] = run(f"psi_drift {n}x", psi_drift_frame(orders))
        legs["bootstrap_ci"] = run(f"bootstrap_ci {n}x", bootstrap_ci_frame(orders))
        legs["cohens_kappa"] = run(f"cohens_kappa {n}x", cohens_kappa_frame(li))
        legs["calibration"] = run(
            f"calibration {n}x", calibration_bins_frame(docs)
        )
        legs["info_gain"] = run(f"info_gain {n}x", info_gain_frame(docs))
        legs["zorder_layout"] = run(
            f"zorder_layout {n}x", zorder_layout_frame(orders)
        )
        record("wave12", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
