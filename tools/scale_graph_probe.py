"""Scaling probe for the iterative graph family (r10 VERDICT #5):
pagerank / k-core / HITS / label propagation at 1x / 10x / 100x a
synthetic edge ladder (5k nodes x ~12 edges/node -> 500k nodes / ~6M
edges), so the family has committed multi-decade evidence like
ann/dedup/events — the registry rows only cover sf0.01 vs sf0.1.

Edges are PURE CODEGEN (xxhash64-derived endpoints off spark.range —
no Python, no disk) with planted structure: ~20% of edges target a
hub set of n/100 nodes, so pagerank/HITS see real rank concentration
and k-core keeps a dense survivor core; the rest are uniform. Node
and edge counts print per leg (untimed) alongside the timings.

Every leg is the REGISTERED algorithm shape: ops.graph.pagerank_int /
kcore_peel / label_propagation, and the max-normalized 2-round HITS
loop of workload/wave6d.graph_hits rebuilt over the synthetic
bipartite split (src = hubs-side, dst = authority-side).

Usage: python tools/scale_graph_probe.py [--scales=1,10,100]
Timings fold into SCALING_graph.json via tools/scaling_record.py.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_neotel_sql_automation_spark.ops import graph as G  # noqa: E402
from etl_neotel_sql_automation_spark.session import get_spark  # noqa: E402

BASE_NODES = 5_000
EDGES_PER_NODE = 12


def synth_edges(spark: SparkSession, n_nodes: int, seed: int = 11) -> DataFrame:
    """Directed (src, dst) edges, distinct, no self-loops, ~20% aimed
    at a hub set of n/100 nodes — all codegen expressions."""
    n_hubs = max(4, n_nodes // 100)
    e = spark.range(n_nodes * EDGES_PER_NODE).withColumnRenamed("id", "eid")
    src = F.pmod(F.xxhash64(F.lit(seed), "eid"), F.lit(n_nodes))
    hub_dst = F.pmod(F.xxhash64(F.lit(seed + 1), "eid"), F.lit(n_hubs))
    uni_dst = F.pmod(F.xxhash64(F.lit(seed + 2), "eid"), F.lit(n_nodes))
    dst = F.when(F.pmod(F.xxhash64(F.lit(seed + 3), "eid"), F.lit(5)) == 0, hub_dst).otherwise(uni_dst)
    return (
        e.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _hits_frame(edges: DataFrame, rounds: int = 2, scale: int = 10**6) -> DataFrame:
    """The registered graph_hits loop (workload/wave6d.py) over a
    generic edge frame: max-normalized exact-integer HITS, top-25
    authorities."""
    hub = edges.select("src").distinct().select("src", F.lit(scale).alias("hub"))
    auth = None
    for _ in range(rounds):
        a0 = edges.join(hub, "src").groupBy("dst").agg(F.sum("hub").alias("auth"))
        amax = a0.agg(F.max("auth").alias("m"))
        auth = a0.crossJoin(F.broadcast(amax)).select(
            "dst", F.expr(f"auth * {scale} div m").alias("auth")
        )
        h0 = edges.join(auth, "dst").groupBy("src").agg(F.sum("auth").alias("hub"))
        hmax = h0.agg(F.max("hub").alias("m"))
        hub = h0.crossJoin(F.broadcast(hmax)).select(
            "src", F.expr(f"hub * {scale} div m").alias("hub")
        )
    return auth.orderBy(F.desc("auth"), "dst").limit(25)


def run(label: str, thunk) -> float:
    t0 = time.perf_counter()
    thunk().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return round(dt, 2)


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        app_name="scale_graph_probe", master="local[32]", shuffle_partitions=32
    )
    synth_edges(spark, 500).write.mode("overwrite").format("noop").save()  # warm

    for n in scales:
        n_nodes = BASE_NODES * n
        edges = synth_edges(spark, n_nodes).localCheckpoint()
        n_edges = edges.count()
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().localCheckpoint()
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint()
        )
        legs = {
            "pagerank": run(f"pagerank {n}x", lambda: G.pagerank_int(edges, iters=3)),
            "kcore": run(f"kcore {n}x", lambda: G.kcore_peel(sym, k=3, rounds=3)),
            "hits": run(f"hits {n}x", lambda: _hits_frame(edges)),
            "label_propagation": run(
                f"label_propagation {n}x",
                lambda: G.label_propagation(nodes, edges, iters=3),
            ),
        }
        record("graph", n, legs)
        print(
            json.dumps(
                {"scale": n, "nodes": n_nodes, "edges": n_edges, **legs}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
