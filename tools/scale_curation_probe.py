"""Scaling probe for the curation family: the Gopher rule gate, the
hashed linear classifier, the duplicated/contaminated span-island
reports, and the COMPOSED end-to-end pretrain pipeline (fingerprint
dedup -> span excision -> quality gate -> DSIR scoring -> per-source
budgeting — the flagship whose stage-boundary skew and AQE
interactions only show up composed) over documents at 1x/10x/100x the
sf0.1 volume (5k -> 50k -> 500k docs), and SemDeDup prune + kNN graph
over embeddings at 1x/10x/100x (2k -> 20k -> 200k vectors).

Corpora are the SAME pure-codegen synthetics the dedup and ANN probes
use (imported, not re-derived), so numbers are comparable across probe
files. The embedding legs apply the documented deploy knob — ``planes``
scales with log2(corpus) so bucket occupancy (and per-bucket pair
count) stays constant; fixed buckets would curve quadratic at 100x.

Usage: python tools/scale_curation_probe.py [--scales=1,10,100]
Committed numbers live in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from etl_neotel_sql_automation_spark.ops import similarity as S
from etl_neotel_sql_automation_spark.session import get_spark
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.workload.corpus_mining import (
    contam_span_frame,
    dup_span_frame,
    pretrain_frame,
)
from etl_neotel_sql_automation_spark.workload.curation import (
    classifier_frame,
    gopher_frame,
)
from tools.scale_ann_probe import BASE_VECS, planes_for, synth_embeddings
from tools.scale_dedup_probe import BASE_DOCS, synth_docs


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]

    spark = get_spark(app_name="scale_curation_probe")
    synth_docs(spark, 1000).write.mode("overwrite").format("noop").save()  # warm

    results: dict[int, dict[str, float]] = {}
    for scale in scales:
        docs = synth_docs(spark, BASE_DOCS * scale)
        # the composed pipeline needs source/lang: 4 sources (so the
        # per-source budget windows see real groups, src0 = the DSIR
        # target) and ~10% non-English (so the language gate prunes)
        full_docs = docs.select(
            "doc_id",
            F.concat(F.lit("src"), F.col("doc_id") % 4).alias("source"),
            F.when(F.col("doc_id") % 10 == 9, "es").otherwise("en").alias("lang"),
            "text",
        )
        emb = synth_embeddings(spark, BASE_VECS * scale)
        planes = planes_for(BASE_VECS * scale)
        ops = {
            "gopher_gate": lambda: gopher_frame(docs),
            "hashed_classifier": lambda: classifier_frame(docs),
            # span legs ride the same planted-duplicate corpus: the ~8%
            # exact/near copies guarantee duplicated windows at every
            # scale, and cost is dominated by the docs x windows explode
            # + gram-keyed count — the shuffle that must stay linear
            "dup_span": lambda: dup_span_frame(docs),
            "contam_span": lambda: contam_span_frame(docs),
            # the COMPOSITION of the stages probed above (+ DSIR +
            # budget windows) — post-r5 every cross-stage join is
            # unhinted, so this row is the AQE-composed cost
            "pretrain_e2e": lambda: pretrain_frame(full_docs),
            # threshold 0.9: the planted near-dups sit at cosine ~0.999,
            # random pairs near 0 — the probe measures candidate-join
            # cost, recall is pinned by the ANN probe's test
            "semantic_prune": lambda: S.semantic_prune(
                emb, planes=planes, threshold=0.9
            ),
            "knn_graph": lambda: S.knn_graph(emb, k=3, planes=planes),
        }
        times: dict[str, float] = {}
        for name, op in ops.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                op().write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 2)
        results[scale] = times
        record("curation", scale, times)
        print(
            json.dumps(
                {
                    "scale": scale,
                    "docs": BASE_DOCS * scale,
                    "vectors": BASE_VECS * scale,
                    "planes": planes,
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
