"""Scaling probe for the r5/r6 production twins: hashed-vocabulary
DSIR, hashed bigram LM, the LSH-indexed margin miner, the
bloom-prefiltered decontamination (whose false-positive rate is
recorded at every scale, not just timed), and the r6 sketches
(count-min heavy hitters, linear-count distinct grams).

Corpora are the SAME pure-codegen synthetics the dedup/ANN/curation
probes use (imported, not re-derived), so rows are comparable across
probe files. Each family applies its DOCUMENTED deploy knob instead of
freezing local constants, because the knob IS the scale claim:

- hashed DSIR / hashed LM: no knob — the whole point is that the
  weight tables are modulus-bounded (4096 / 2048+8192 rows) at any
  corpus size, so the probe runs them untouched;
- margin miner: ``planes`` tracks log2(per-label population) (the
  multi-table family's occupancy rule, shared with the ANN probes)
  while ``tables`` stays at the registered 16;
- bloom prefilter: ``bits`` sizes to the synthetic eval-gram count so
  kn/m — and therefore the FP rate — stays constant as the eval set
  grows (the decontam_bloom_quality docstring's sizing rule; a frozen
  m would saturate at 100x and the probe would only measure that).

Usage: python tools/scale_hashed_probe.py [--scales=1,10,100]
Committed numbers live in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.corpus_mining import (
    bloom_fp_frame,
    bloom_prefilter_frame,
    dsir_hashed_frame,
    margin_indexed_frame,
)
from etl_neotel_sql_automation_spark.workload.corpus_stats import (
    bigram_lm_hashed_frame,
    cms_heavy_hitters_frame,
    lc_distinct_frame,
)
from tools.scale_ann_probe import BASE_VECS, planes_for, synth_embeddings
from tools.scale_dedup_probe import BASE_DOCS, synth_docs


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]

    spark = get_spark(app_name="scale_hashed_probe")
    synth_docs(spark, 1000).write.mode("overwrite").format("noop").save()  # warm

    results: dict[int, dict[str, float]] = {}
    for scale in scales:
        docs = synth_docs(spark, BASE_DOCS * scale)
        # DSIR needs sources: 4, with src0 the target (curation-probe
        # convention, so per-source token masses stay comparable)
        sdocs = docs.select(
            "doc_id",
            F.concat(F.lit("src"), F.col("doc_id") % 4).alias("source"),
            "text",
        )
        # margin needs labels: testdata convention (vec_id % 10-ish
        # classes); label 0 and 1 populations are each n/10
        emb = synth_embeddings(spark, BASE_VECS * scale).withColumn(
            "label", (F.col("vec_id") % 10).cast("int")
        )
        m_planes = planes_for(BASE_VECS * scale // 10)
        # bloom: eval grams ~ 2% of docs x ~51 windows; size m so
        # kn/m stays at the registered design point (65536 bits per
        # ~4.9k sf0.1-scale eval grams -> scale linearly)
        bloom_bits = 65536 * scale

        ops = {
            "dsir_hashed": lambda: dsir_hashed_frame(sdocs),
            "bigram_lm_hashed": lambda: bigram_lm_hashed_frame(docs),
            "margin_indexed": lambda: margin_indexed_frame(
                emb, planes=m_planes
            ),
            "bloom_prefilter": lambda: bloom_prefilter_frame(
                docs, bits=bloom_bits
            ),
            # the r6 sketches: CMS state is 4x1024 cells and LC state
            # is <= 1093 words at ANY scale — no knob; their exact
            # validation legs (top-20 count, count_distinct) are the
            # corpus-scaled part and the honest cost being measured
            "cms_heavy_hitters": lambda: cms_heavy_hitters_frame(docs),
            "lc_distinct": lambda: lc_distinct_frame(docs),
        }
        times: dict[str, float] = {}
        for name, op in ops.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                op().write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 2)
        # FP meter: record the measured rate AND its wall, one pass
        t0 = time.perf_counter()
        fp_row = bloom_fp_frame(docs, bits=bloom_bits).collect()[0]
        times["bloom_fp_meter"] = round(time.perf_counter() - t0, 2)
        results[scale] = times
        record("hashed", scale, times)
        print(
            json.dumps(
                {
                    "scale": scale,
                    "docs": BASE_DOCS * scale,
                    "vectors": BASE_VECS * scale,
                    "margin_planes": m_planes,
                    "bloom_bits": bloom_bits,
                    "bloom_fp_ppm": fp_row["fp_ppm"],
                    "bloom_n_eval_grams": fp_row["n_eval_grams"],
                    "times_sec": times,
                }
            ),
            flush=True,
        )

    if len(results) > 1:
        base = results[min(results)]
        top = results[max(results)]
        growth = max(results) / min(results)
        ratios = {
            n: round(top[n] / base[n] / growth, 3) for n in base if base[n] > 0
        }
        print(json.dumps({"linear_fraction_at_max_scale": ratios}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
