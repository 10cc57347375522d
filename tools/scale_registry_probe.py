"""Generic scaling probe over the HEAVY-FAMILY registry queries
(r9 VERDICT #5 closure): every registered query in the dedup /
similarity / embedding / multimodal / graph families is timed at
sf0.01 (scale "1") and sf0.1 (scale "10" — 10x the documents corpus)
and recorded machine-readably in SCALING_registry.json via
tools/scaling_record.py.

This is the closure layer: the specialized probes (scale_dedup_probe,
scale_ann_probe, scale_wave73_probe, ...) measure synthetic 1x/10x/100x
ladders with planted structure — richer evidence, but each covers only
its legs. This probe guarantees EVERY heavy query resolves to at least
one machine-readable scaling row, and tests/test_scaling_records.py
asserts that closure, so a new heavy query fails CI until it is
probed.

Usage: python tools/scale_registry_probe.py [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from etl_neotel_sql_automation_spark import workload  # noqa: E402
from etl_neotel_sql_automation_spark.session import get_spark  # noqa: E402

HEAVY_PREFIXES = ("dedup_", "sim_", "emb_", "multimodal_", "graph_")

SF_SCALES = {"/root/testdata/sf0.01": 1, "/root/testdata/sf0.1": 10}


def heavy_queries() -> list[str]:
    return sorted(
        n for n in workload.queries() if n.startswith(HEAVY_PREFIXES)
    )


def main() -> None:
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = only or heavy_queries()
    qs = workload.queries()
    spark = get_spark(
        app_name="scale_registry_probe", master="local[32]",
        shuffle_partitions=32,
    )
    # untimed warm-up (the bench/check_oracle session policy)
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").selectExpr(
        "sum(l_quantity)"
    ).collect()
    for sf_dir, scale in SF_SCALES.items():
        # one untimed warm query per SF (r10 VERDICT #4): without it
        # the first timed entry absorbs the SF's codegen/scan warm-up
        # and the record inverts (dedup_canonical_docs read 6.5 s at
        # 1x vs 5.5 s at 10x in the r10 file)
        qs[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()
        legs: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            legs[name] = round(time.perf_counter() - t0, 2)
            print(f"  {name} @ {scale}x: {legs[name]}s", flush=True)
        record("registry", scale, legs)
        print(json.dumps({"scale": scale, **legs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
