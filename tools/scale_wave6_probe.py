"""Scaling probe for the round-6 wave-3 operators: prefix-filtered
Jaccard join, sparse-cosine inverted index, k-core peeling, and
grid-bucketed spatial kNN at 1x / 10x / 100x their sf0.1 volumes.

Corpora are pure-codegen synthetics: documents reuse
scale_dedup_probe.synth_docs (planted exact/near duplicate structure
the similarity joins must actually find), the graph is a bipartite
purchase-shaped edge set off spark.range, and the point sets are
xxhash64-derived micro-degree coordinates. Every leg runs the EXACT
registered code path (ops.dedup.jaccard_prefix_pairs,
ops.text.sparse_cosine_topk, ops.graph.kcore_peel,
ops.geo.grid_nearest).

Usage: python tools/scale_wave6_probe.py [--scales=1,10,100]
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

from etl_neotel_sql_automation_spark.ops.dedup import jaccard_prefix_pairs
from etl_neotel_sql_automation_spark.ops.geo import grid_nearest
from etl_neotel_sql_automation_spark.ops.graph import kcore_peel
from etl_neotel_sql_automation_spark.ops.text import sparse_cosine_topk
from etl_neotel_sql_automation_spark.session import get_spark
from scale_dedup_probe import synth_docs

BASE_DOCS = 5_000       # sf0.1 documents volume
BASE_CUSTS = 15_000     # sf0.1 customer volume (grid probe points)
BASE_SUPPS = 1_000      # sf0.1 supplier volume (grid targets)
BASE_EDGES = 60_000     # ~sf0.1 distinct (cust, supp) purchase pairs
LAT_MOD, LON_MOD, CELL = 180_000_000, 360_000_000, 30_000_000


def synth_points(spark: SparkSession, n: int, salt: str, id_col: str) -> DataFrame:
    """(id, lat_u, lon_u) with xxhash64-derived non-negative coords —
    same distribution shape as the registered query's md5 coords
    (uniform over the plane), but pure codegen for probe speed."""
    return spark.range(n).select(
        F.col("id").alias(id_col),
        F.pmod(F.xxhash64(F.lit(salt + "lat"), "id"), F.lit(LAT_MOD)).alias("lat_u"),
        F.pmod(F.xxhash64(F.lit(salt + "lon"), "id"), F.lit(LON_MOD)).alias("lon_u"),
    )


def synth_edges(spark: SparkSession, n_pairs: int, n_cust: int, n_supp: int) -> DataFrame:
    """Symmetric bipartite edge set shaped like the purchase graph:
    n_pairs distinct (customer, offset+supplier) pairs, both node
    populations scaling with the pair count so degrees stay in the
    sf0.1 band (~4 suppliers/customer, ~60 customers/supplier) — the
    regime where the registered k cascades."""
    raw = (
        spark.range(n_pairs)
        .select(
            F.pmod(F.xxhash64(F.lit("c"), "id"), F.lit(n_cust)).alias("a"),
            (F.lit(10_000_000) + F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(n_supp))).alias("b"),
        )
        .distinct()
    )
    return raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
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
    spark = get_spark(app_name="scale_wave6_probe", master="local[32]",
                      shuffle_partitions=32)
    for n in scales:
        docs = synth_docs(spark, BASE_DOCS * n)
        pts = synth_points(spark, BASE_CUSTS * n, "p", "pid")
        tgt = synth_points(spark, BASE_SUPPS * n, "t", "tid")
        edges = synth_edges(spark, BASE_EDGES * n, BASE_CUSTS * n, BASE_SUPPS * n)
        legs: dict = {}
        res = {"scale": n, "docs": BASE_DOCS * n}
        legs["jaccard_prefix"] = run(
            f"jaccard_prefix {n}x",
            jaccard_prefix_pairs(docs, block_col=None, num=1, den=2, gram_n=3),
        )
        legs["sparse_cosine"] = run(
            f"sparse_cosine {n}x", sparse_cosine_topk(docs)
        )
        legs["kcore"] = run(f"kcore {n}x", kcore_peel(edges, k=48, rounds=3))
        # the deploy knob ops/geo.py documents: cell ~ 1/sqrt(target
        # density) keeps occupancy constant — a FIXED cell with both
        # sides scaling is O(N*M) (measured: 0.8 -> 20.1 s at 10x)
        cell = max(1, int(CELL / (n ** 0.5)))
        legs["grid_knn"] = run(f"grid_knn {n}x (cell {cell})",
                              grid_nearest(pts, tgt, cell))
        record("wave6", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
