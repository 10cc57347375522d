"""Scale probe for the round-7 wave legs (1x/10x/100x synthetics).

Reuses the wave-17 probe's synthetic generators so the numbers are
comparable with the existing SCALING.md rows, but times ONLY the
round-7 frame cores — the full wave17 probe re-times six rounds of
legs and takes an hour at 100x.

Usage: python tools/scale_wave31_probe.py [--scales=1,10,100]
Writes one JSON line per scale to stdout (redirect to a file: the
memory note — background grep pipes buffer).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave31 import (
    pr_curve_frame,
    pr_curve_sampled_frame,
    rank_metrics_frame,
    rank_metrics_sampled_frame,
)
from etl_neotel_sql_automation_spark.workload.wave32 import (
    brier_decomposition_frame,
    charset_profile_frame,
)
from etl_neotel_sql_automation_spark.workload.wave33 import croston_frame
from etl_neotel_sql_automation_spark.workload.wave34 import (
    markov_attribution_frame,
)
from etl_neotel_sql_automation_spark.workload.wave35 import (
    jl_distortion_frame,
)
from etl_neotel_sql_automation_spark.workload.wave36 import (
    hilbert_layout_frame,
)
from etl_neotel_sql_automation_spark.workload.wave37 import (
    gate_sweep_frame,
    length_bucket_frame,
)
from etl_neotel_sql_automation_spark.workload.wave38 import (
    fertility_frame,
    holt_winters_frame,
)
from etl_neotel_sql_automation_spark.workload.wave39 import (
    generalization_ladder_frame,
    ses_sweep_frame,
)
from etl_neotel_sql_automation_spark.workload.wave40 import (
    abc_xyz_frame,
    shapley_airport_frame,
)
from tools.scale_wave12_probe import synth_documents
from tools.scale_wave17_probe import run


def synth_emb(spark, n_vecs: int):
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.lit("v"), F.col("id"), i), F.lit(200))
                - 100
            ).cast("double")
            / 100.0,
        )
        .cast("array<float>")
        .alias("embedding"),
    )
    # materialize: registered queries read parquet; an expression-
    # backed synthetic would re-inline the generator per consumer
    return emb.localCheckpoint()


def synth_li_sparse(spark, n_lines: int):
    """Sparse per-part demand: 2000 parts, hash-scattered ship days
    over 6 years — every part recurses, exercising the multi-series
    fold (the registered query filters to a literal part set; the
    probe times the every-part shape)."""
    return spark.range(n_lines).select(
        F.pmod(F.xxhash64(F.lit("p"), "id"), F.lit(2_000)).alias("l_partkey"),
        F.timestamp_micros(
            (
                F.lit(694_224_000)  # 1992-01-01 UTC
                + F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(2190))
                * 86_400
            )
            * 1_000_000
        ).alias("l_shipdate"),
        (F.pmod(F.xxhash64(F.lit("q"), "id"), F.lit(50)) + 1)
        .cast("double")
        .alias("l_quantity"),
    )


def synth_events(spark, n_events: int):
    """5-type event stream: ~20k users per 200k events, all five
    channels plus purchases, 30-day window — every journey shape the
    attribution walks (multi-touch, zero-touch converter, never-
    converter)."""
    types = F.array(
        F.lit("view"), F.lit("click"), F.lit("signup"), F.lit("error"),
        F.lit("purchase"),
    )
    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (
                F.lit(1_704_067_200)  # 2024-01-01 UTC
                + F.pmod(F.xxhash64(F.lit("t"), "id"), F.lit(30 * 86_400))
            )
            * 1_000_000
        ).alias("ts"),
        F.pmod(F.xxhash64(F.lit("u"), "id"), F.lit(n_events // 10)).alias(
            "user_id"
        ),
        F.element_at(
            types,
            (F.pmod(F.xxhash64(F.lit("e"), "id"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64(F.lit("v"), "id"), F.lit(30_000)) / 100.0).alias(
            "value"
        ),
    )


def synth_orders_like(spark, n_rows: int):
    """(orderkey, custkey, orderdate) triple for the layout meter:
    hash-scattered customers and days, the 2-D distribution the
    space-filling sorts exist for."""
    return spark.range(n_rows).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64(F.lit("c"), "id"), F.lit(15_000)).alias(
            "o_custkey"
        ),
        F.timestamp_micros(
            (
                F.lit(789_004_800)  # 1995-01-01 UTC
                + F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(2190))
                * 86_400
            )
            * 1_000_000
        ).alias("o_orderdate"),
    )


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        app_name="scale_wave31_probe", master="local[32]",
        shuffle_partitions=32,
    )
    for n in scales:
        emb = synth_emb(spark, 60_000 * n)
        legs: dict = {}
        res = {"scale": n, "vecs": 60_000 * n}
        legs["rank_metrics"] = run(
            f"rank_metrics {n}x", rank_metrics_frame(emb)
        )
        legs["pr_curve"] = run(f"pr_curve {n}x", pr_curve_frame(emb))
        legs["rank_metrics_sampled"] = run(
            f"rank_metrics_sampled {n}x", rank_metrics_sampled_frame(emb)
        )
        legs["pr_curve_sampled"] = run(
            f"pr_curve_sampled {n}x", pr_curve_sampled_frame(emb)
        )
        docs = synth_documents(spark, 5_000 * n).localCheckpoint()
        res["docs"] = 5_000 * n
        legs["brier"] = run(f"brier {n}x", brier_decomposition_frame(docs))
        legs["charset"] = run(f"charset {n}x", charset_profile_frame(docs))
        li = synth_li_sparse(spark, 600_000 * n)
        legs["croston"] = run(f"croston {n}x", croston_frame(li))
        ev = synth_events(spark, 200_000 * n)
        legs["markov_attr"] = run(
            f"markov_attr {n}x", markov_attribution_frame(ev)
        )
        legs["jl_distortion"] = run(
            f"jl_distortion {n}x", jl_distortion_frame(emb)
        )
        orders = synth_orders_like(spark, 60_000 * n)
        legs["hilbert_layout"] = run(
            f"hilbert_layout {n}x", hilbert_layout_frame(orders)
        )
        legs["gate_sweep"] = run(f"gate_sweep {n}x", gate_sweep_frame(docs))
        legs["length_buckets"] = run(
            f"length_buckets {n}x", length_bucket_frame(docs)
        )
        legs["holt_winters"] = run(
            f"holt_winters {n}x", holt_winters_frame(orders)
        )
        legs["fertility"] = run(f"fertility {n}x", fertility_frame(docs))
        legs["ses_sweep"] = run(f"ses_sweep {n}x", ses_sweep_frame(orders))
        legs["gen_ladder"] = run(
            f"gen_ladder {n}x", generalization_ladder_frame(orders)
        )
        orders_p = orders.withColumn(
            "o_orderpriority",
            F.element_at(
                F.array(
                    F.lit("1-URGENT"), F.lit("2-HIGH"), F.lit("3-MEDIUM"),
                    F.lit("4-NOT SPECI"), F.lit("5-LOW"),
                ),
                (F.pmod(F.xxhash64(F.lit("q"), "o_orderkey"), F.lit(5)) + 1)
                .cast("int"),
            ),
        ).withColumn(
            "o_totalprice",
            F.pmod(F.xxhash64(F.lit("tp"), "o_orderkey"), F.lit(5_000_000))
            / 100.0,
        )
        legs["shapley"] = run(
            f"shapley {n}x", shapley_airport_frame(orders_p)
        )
        li2 = synth_li_sparse(spark, 600_000 * n).withColumn(
            "l_extendedprice",
            F.pmod(F.xxhash64(F.lit("xp"), "l_partkey"), F.lit(1_000_000))
            / 100.0,
        )
        legs["abc_xyz"] = run(f"abc_xyz {n}x", abc_xyz_frame(li2))
        record("wave31", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)


if __name__ == "__main__":
    main()
