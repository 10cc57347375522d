"""Scaling probe for the similarity family: hyperplane-LSH near-dup,
brute-force top-k, and SQ8 quantized top-k at 1x / 10x / 100x the
sf0.1 embeddings volume (2k -> 20k -> 200k vectors, 64-dim).

Embeddings are generated with PURE CODEGEN expressions (xxhash64 bits
-> uniform [-1, 1] components off spark.range — no Python, no disk),
with ~2% planted near-duplicates (a copy of the previous vector with
one component perturbed -> cosine ~0.99+) that the LSH path must find
(pinned by a recall test).

The LSH leg scales ``planes_per_table`` with log2(corpus) — the knob
SCALING.md documents: bucket count (2^planes) must grow with the
corpus or per-bucket candidate pairs grow quadratically. The probe
therefore measures the DEPLOY configuration at each scale, not a
fixed-bucket toy that would blow up at 100x.

Usage: python tools/scale_ann_probe.py [--scales=1,10,100]
Committed numbers live in SCALING.md.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.ops import similarity as S
from etl_neotel_sql_automation_spark.session import get_spark

BASE_VECS = 2_000   # sf0.1 embeddings volume
DIM = 64


def synth_embeddings(spark: SparkSession, n: int, seed: int = 13) -> DataFrame:
    """(vec_id, embedding array<double>) with planted structure, all
    codegen: components are xxhash64-derived uniforms in [-1, 1];
    vec_id % 50 == 1 (~2%) duplicates the previous vector with one
    deterministic component nudged by 0.05 (cosine vs base ~0.999)."""
    mod = F.col("vec_id") % 50
    base_id = F.when(mod == 1, F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    comp = lambda i: (  # noqa: E731
        F.pmod(F.xxhash64(F.lit(seed), base_id, i), F.lit(2001)) - 1000
    ) / 1000.0
    nudge_pos = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(DIM))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: comp(i) + F.when((mod == 1) & (i == nudge_pos), 0.05).otherwise(0.0),
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .select("vec_id", vec.alias("embedding"))
    )


def planes_for(n: int) -> int:
    """The documented deploy knob: bucket count scales with the corpus
    so OCCUPANCY stays ~constant (~25 vectors/bucket -> candidate pairs
    linear in n; fat buckets are the quadratic failure mode). Floored
    at the local-fixture default of 4. Recall for the planted
    cosine~0.999 dups stays ~1.0 under 16 tables even at 17 planes
    (1-(1-0.986^17)^16); threshold-0.9 pairs hold ~0.9 at 13."""
    return max(4, int(math.log2(max(n, 2))) - 4)


def _emb_cr(df: DataFrame, planes: int) -> DataFrame:
    from etl_neotel_sql_automation_spark.workload.wave78 import (
        emb_capture_recapture_frame,
    )

    return emb_capture_recapture_frame(df, planes_per_table=planes)


def ops_for(scale: int):
    n = BASE_VECS * scale
    return {
        "lsh_near_dup": lambda df: S.lsh_near_dup_pairs(
            df, threshold=0.9, planes_per_table=planes_for(n)
        ),
        "brute_force_topk10q": lambda df: S.brute_force_topk(
            df, df.filter(F.col("vec_id") < 10), k=5
        ),
        "sq8_topk10q": lambda df: S.sq8_topk(
            df, df.filter(F.col("vec_id") < 10), k=5
        ),
        # r10: the wave-78 Chapman coverage audit over the 16-table
        # hyperplane index — candidates + bounded cosine verification +
        # 1-row estimator; rides the SAME planes-scale knob as
        # lsh_near_dup (fixed 4-plane buckets measured 262 s at the 10x
        # leg — the quadratic fat-bucket mode the knob exists to avoid)
        "emb_capture_recapture": lambda df: _emb_cr(df, planes_for(n)),
    }


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]

    spark = get_spark(app_name="scale_ann_probe")
    synth_embeddings(spark, 500).write.mode("overwrite").format("noop").save()

    results: dict[int, dict[str, float]] = {}
    for scale in scales:
        emb = synth_embeddings(spark, BASE_VECS * scale)
        times: dict[str, float] = {}
        for name, op in ops_for(scale).items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                op(emb).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 2)
        results[scale] = times
        record("ann", scale, times)
        print(
            json.dumps(
                {
                    "scale": scale,
                    "vectors": BASE_VECS * scale,
                    "lsh_planes": planes_for(BASE_VECS * scale),
                    **times,
                }
            )
        )

    if len(results) > 1:
        base = results[scales[0]]
        for s in scales[1:]:
            ratios = {
                k: round(results[s][k] / base[k] / (s / scales[0]), 2)
                for k in results[s]
            }
            print(json.dumps({"linearity_vs_vectors": ratios, "scale": s}))

    # r8 VERDICT #6: isolate the CONSTRUCT cost of the sampled
    # locally-fit IVF-PQ (hash-sample collect + 9 k-means fits run at
    # plan-construction time — the real 100 TB training cost) from its
    # exec cost, at 1x and 10x. Best-of-2 each; emb localCheckpointed
    # so the synth codegen isn't charged to either stage.
    for scale in [s for s in scales if s <= 10]:
        n = BASE_VECS * scale
        emb = synth_embeddings(spark, n).localCheckpoint()
        best_c, best_tot = float("inf"), float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            ann = S.ivf_pq_topk(
                emb,
                emb.filter(F.col("vec_id") < 10),
                k=5,
                train_fraction=0.25,
                train_backend="local",
                rerank=max(100, n // 5),
            )
            t1 = time.perf_counter()
            ann.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            if t2 - t0 < best_tot:
                best_tot, best_c = t2 - t0, t1 - t0
        record(
            "ann",
            scale,
            {
                "ivf_pq_sampled_local": {
                    "construct": round(best_c, 2),
                    "exec": round(best_tot - best_c, 2),
                    "total": round(best_tot, 2),
                },
            },
        )
        print(
            json.dumps(
                {
                    "construct_probe": "ivf_pq_sampled_local",
                    "scale": scale,
                    "vectors": n,
                    "construct": round(best_c, 2),
                    "exec": round(best_tot - best_c, 2),
                    "total": round(best_tot, 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
