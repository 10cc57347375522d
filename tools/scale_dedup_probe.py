"""Scaling probe for the dedup family: exact / fingerprint /
MinHash-LSH / SimHash at 1x / 10x / 100x the sf0.1 documents volume
(5k -> 50k -> 500k docs, ~54 tokens each), wall-time per operator per
scale.

The corpus is generated with PURE CODEGEN column expressions
(xxhash64-derived token streams off spark.range — no Python, no disk),
so generation cost never masks operator cost and any scale is
reachable. Construction plants structure the dedup operators must
find: ~8% of docs are EXACT copies of a family base and ~12% are
near-copies (one token in ~54 replaced -> shingle-Jaccard ~0.85), the
rest unique. Rows are a pure function of (seed, doc_id), so runs are
reproducible like the events probe.

Usage: python tools/scale_dedup_probe.py [--scales=1,10,100]
Prints one JSON line per scale plus linearity ratios; committed
numbers live in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.ops import dedup as D
from etl_neotel_sql_automation_spark.session import get_spark

BASE_DOCS = 5_000   # sf0.1 documents volume
N_TOKENS = 54       # sf0.1 mean tokens/doc
VOCAB = 5_000


def synth_docs(spark: SparkSession, n_docs: int, seed: int = 11) -> DataFrame:
    """Documents-shaped frame (doc_id, text) with planted duplicate
    structure, entirely in codegen expressions:

    - doc_id % 25 == 1 (~4%): exact copy of the family base (doc_id-1)
    - doc_id % 25 == 2 (~4%): near copy (one token replaced)
    - otherwise: unique token stream

    Token k of document d is ``t<xxhash64(seed, family, k) % VOCAB>``
    where family collapses copies onto their base — the whole text
    column is one transform + concat_ws over a sequence, no Python."""
    mod = F.col("doc_id") % 25
    family = F.when(mod.isin(1, 2), F.col("doc_id") - mod).otherwise(F.col("doc_id"))
    tok = lambda k: F.concat(  # noqa: E731
        F.lit("t"), F.pmod(F.xxhash64(F.lit(seed), family, k), F.lit(VOCAB))
    )
    toks = F.transform(F.sequence(F.lit(1), F.lit(N_TOKENS)), tok)
    # near copies swap one deterministic position for a doc-unique token
    swap_pos = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_TOKENS)) + 1
    near = F.transform(
        F.sequence(F.lit(1), F.lit(N_TOKENS)),
        lambda k: F.when(
            (mod == 2) & (k == swap_pos),
            F.concat(F.lit("u"), F.col("doc_id")),
        ).otherwise(tok(k)),
    )
    return (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", F.concat_ws(" ", near).alias("text"))
    )


OPS = {
    "exact": D.exact_groups,
    "fingerprint": D.fingerprint_groups,
    "minhash_lsh": lambda df: D.minhash_lsh_candidates(df, hash_fn="xxhash64"),
    "simhash": D.simhash,
}


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]

    spark = get_spark(app_name="scale_dedup_probe")
    # warm off the measured path
    synth_docs(spark, 1000).write.mode("overwrite").format("noop").save()

    results: dict[int, dict[str, float]] = {}
    for scale in scales:
        docs = synth_docs(spark, BASE_DOCS * scale)
        times: dict[str, float] = {}
        for name, op in OPS.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                op(docs).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 2)
        results[scale] = times
        record("dedup", scale, times)
        print(json.dumps({"scale": scale, "docs": BASE_DOCS * scale, **times}))

    if len(results) > 1:
        base = results[scales[0]]
        for s in scales[1:]:
            ratios = {k: round(results[s][k] / base[k] / (s / scales[0]), 2) for k in OPS}
            print(json.dumps({"linearity_vs_docs": ratios, "scale": s}))
    spark.stop()


if __name__ == "__main__":
    main()
