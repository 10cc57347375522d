"""Scale probe for the round-9 waves 73-75 frames (1x/10x/100x
synthetic inputs — the wave-12 document generator plus a codegen
orders synth, so rows sit beside the existing SCALING.md families).

Usage: python tools/scale_wave73_probe.py [--scales=1,10,100]
Writes one JSON line per (family, scale) to stdout.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave73 import (
    dim_profile_frame,
    phash_capture_recapture_frame,
    phash_quality_frame,
)
from etl_neotel_sql_automation_spark.workload.wave74 import (
    byte_entropy_frame,
    clipping_rate_frame,
    silence_runs_frame,
)
from etl_neotel_sql_automation_spark.workload.wave75 import (
    doc_perplexity_frame,
    median_of_means_frame,
    weighted_reservoir_frame,
)
from etl_neotel_sql_automation_spark.workload.wave76 import (
    spectral_peaks_frame,
)
from etl_neotel_sql_automation_spark.workload.wave77 import (
    closeness_bfs_frame,
    pareto_front_frame,
)
from tools.scale_wave12_probe import synth_documents


def run(label, mk_frame):
    t0 = time.perf_counter()
    mk_frame().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return round(dt, 2)


def synth_orders(spark, n: int):
    """(o_orderkey, o_totalprice) with a hash-scattered heavy-tail
    price — the weighted-sampling / robust-mean domain."""
    return spark.range(1, n + 1).select(
        F.col("id").alias("o_orderkey"),
        (
            (F.pmod(F.xxhash64(F.lit("p"), "id"), F.lit(99_000)) + 1_000)
            / 100.0
        ).alias("o_totalprice"),
    )


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]

    for family in ("docs", "orders"):
        spark = get_spark(
            app_name=f"scale_wave73_probe_{family}",
            master="local[32]",
            shuffle_partitions=32,
        )
        for n in scales:
            legs: dict = {}
            res = {"family": family, "scale": n}
            if family == "docs":
                docs = synth_documents(spark, 5_000 * n).localCheckpoint()
                res["docs"] = 5_000 * n
                # deploy recipe: mod scales with the corpus so the
                # sampled ground-truth join stays CONSTANT-sized
                res["phash_quality_mod"] = 2 * n
                legs["phash_quality"] = run(
                    f"phash_quality {n}x",
                    lambda: phash_quality_frame(docs, mod=2 * n),
                )
                legs["phash_capture_recapture"] = run(
                    f"phash_cr {n}x",
                    lambda: phash_capture_recapture_frame(docs),
                )
                legs["dim_profile"] = run(
                    f"dim_profile {n}x", lambda: dim_profile_frame(docs)
                )
                legs["byte_entropy"] = run(
                    f"byte_entropy {n}x", lambda: byte_entropy_frame(docs)
                )
                legs["clipping_rate"] = run(
                    f"clipping_rate {n}x", lambda: clipping_rate_frame(docs)
                )
                legs["silence_runs"] = run(
                    f"silence_runs {n}x", lambda: silence_runs_frame(docs)
                )
                legs["doc_perplexity"] = run(
                    f"doc_perplexity {n}x", lambda: doc_perplexity_frame(docs)
                )
            else:
                orders = synth_orders(spark, 150_000 * n).localCheckpoint()
                res["orders"] = 150_000 * n
                legs["weighted_reservoir"] = run(
                    f"weighted_reservoir {n}x",
                    lambda: weighted_reservoir_frame(orders),
                )
                legs["median_of_means"] = run(
                    f"median_of_means {n}x",
                    lambda: median_of_means_frame(orders),
                )
                dated = orders.select(
                    "o_orderkey",
                    "o_totalprice",
                    F.expr(
                        "date_add(DATE '1992-01-01',"
                        " CAST(o_orderkey % 2400 AS INT))"
                    ).alias("o_orderdate"),
                )
                legs["pareto_front"] = run(
                    f"pareto_front {n}x", lambda: pareto_front_frame(dated)
                )
                legs["spectral_peaks"] = run(
                    f"spectral_peaks {n}x",
                    lambda: spectral_peaks_frame(dated),
                )
                # BFS over a synthetic bipartite purchase graph:
                # customers n/15, suppliers n/150 (the TPC-H ratio),
                # ~n distinct edges; undirected
                raw = orders.select(
                    F.pmod(F.xxhash64(F.lit("c"), "o_orderkey"),
                           F.lit(max(150_000 * n // 15, 5))).alias("a"),
                    # the shared workload offset (GRAPH_SUPP_OFFSET):
                    # at the 100x leg customer ids reach 1M, so the old
                    # 100000 offset collided the keyspaces (self-loops,
                    # merged nodes — the r9 ADVICE bug class)
                    (1_000_000_000
                     + F.pmod(F.xxhash64(F.lit("s"), "o_orderkey"),
                              F.lit(max(150_000 * n // 150, 5)))).alias("b"),
                ).distinct()
                edges = raw.select(
                    F.col("a").alias("src"), F.col("b").alias("dst")
                ).union(
                    raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
                ).localCheckpoint()
                legs["closeness_bfs"] = run(
                    f"closeness_bfs {n}x", lambda: closeness_bfs_frame(edges)
                )
            record("wave73", res["scale"], legs)
            print(json.dumps({**res, **legs}), flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
