"""Scaling probe for the round-6 wave-8 operators: FIFO prefix-sum
allocation, the t-closeness privacy audit, and the Kneser-Ney bigram
LM at 1x / 10x / 100x their sf0.1 volumes.

Corpora are pure-codegen synthetics shaped like the real inputs:
lineitem-shaped lots/demand off spark.range (part population scales
with volume so per-part lot depth stays in the sf0.1 band — the FIFO
window's state is per-part, and that is the claim under test),
customer-shaped (nation, band, segment) rows, and the bigram stream
off scale_dedup_probe.synth_docs through the registered tokenizer.
Every leg runs the EXACT registered code path (workload.wave8
*_frame bodies).

Usage: python tools/scale_wave8_probe.py [--scales=1,10,100]
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

from etl_neotel_sql_automation_spark.ops import text as X
from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave8 import (
    fifo_allocation_frame,
    kneser_ney_frame,
    t_closeness_frame,
)
from scale_dedup_probe import synth_docs

BASE_LINES = 600_000  # sf0.1 lineitem volume
BASE_PARTS = 20_000   # sf0.1 part population (lot depth ~30 stays flat)
BASE_CUSTS = 15_000   # sf0.1 customer population
BASE_DOCS = 5_000     # sf0.1 documents volume
N_NATIONS = 25
N_SEGMENTS = 5
N_BANDS = 11


def synth_lots_dem(
    spark: SparkSession, n_lines: int, n_parts: int
) -> tuple[DataFrame, DataFrame]:
    """Lineitem-shaped supply lots and per-part demand: ~2/3 of rows
    are pre-cutoff lots, the rest aggregate into demand, qty 1..50."""
    base = spark.range(n_lines).select(
        F.pmod(F.xxhash64(F.lit("p"), "id"), F.lit(n_parts)).alias("pk"),
        (F.pmod(F.xxhash64(F.lit("q"), "id"), F.lit(50)) + 1).alias("qty"),
        F.timestamp_micros(
            F.pmod(F.xxhash64(F.lit("t"), "id"), F.lit(86_400_000)) * 1_000_000
        ).alias("sd"),
        F.col("id").alias("ok"),
        (F.col("id") % 7).cast("int").alias("ln"),
        F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(3)).alias("side"),
    )
    lots = base.filter(F.col("side") < 2).select("pk", "qty", "sd", "ok", "ln")
    dem = (
        base.filter(F.col("side") == 2)
        .groupBy("pk")
        .agg(F.sum("qty").alias("demand"))
    )
    return lots, dem


def synth_customers(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.pmod(F.xxhash64(F.lit("n"), "id"), F.lit(N_NATIONS)).alias("nk"),
        F.pmod(F.xxhash64(F.lit("b"), "id"), F.lit(N_BANDS)).alias("band"),
        F.concat(
            F.lit("seg"), F.pmod(F.xxhash64(F.lit("g"), "id"), F.lit(N_SEGMENTS))
        ).alias("seg"),
    )


def synth_bigrams(spark: SparkSession, n_docs: int) -> DataFrame:
    docs = synth_docs(spark, n_docs)
    toks = X.tokens(F.col("text"))
    cnt = F.size(toks)
    idx = F.when(cnt >= 2, F.sequence(F.lit(1), cnt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return docs.select(toks.alias("toks"), F.explode(idx).alias("pos")).select(
        F.element_at("toks", F.col("pos")).alias("w1"),
        F.element_at("toks", F.col("pos") + 1).alias("w2"),
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
        app_name="scale_wave8_probe", master="local[32]", shuffle_partitions=32
    )
    for n in scales:
        lots, dem = synth_lots_dem(spark, BASE_LINES * n, BASE_PARTS * n)
        custs = synth_customers(spark, BASE_CUSTS * n)
        bigrams = synth_bigrams(spark, BASE_DOCS * n)
        legs: dict = {}
        res = {"scale": n, "lines": BASE_LINES * n, "custs": BASE_CUSTS * n,
               "docs": BASE_DOCS * n}
        legs["fifo_allocation"] = run(
            f"fifo_allocation {n}x", fifo_allocation_frame(lots, dem)
        )
        legs["t_closeness"] = run(f"t_closeness {n}x", t_closeness_frame(custs))
        legs["kneser_ney"] = run(f"kneser_ney {n}x", kneser_ney_frame(bigrams))
        record("wave8", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
