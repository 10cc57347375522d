"""Scale probe for the r8 sampled retrieval-meter twins (1x/10x/100x
synthetics) — times the four wave-31 retrieval legs side by side so
the SCALING.md row shows what the md5 corpus sample buys the exact
legs (the r7 VERDICT: the unsampled meters' 100x wall, 71-86 s, is
dominated by the exact brute-force leg).

Usage: python tools/scale_wave31b_probe.py [--scales=1,10,100]
Writes one JSON line per scale to stdout (redirect to a file: the
memory note — background grep pipes buffer).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave31 import (
    pr_curve_frame,
    pr_curve_sampled_frame,
    rank_metrics_frame,
    rank_metrics_sampled_frame,
)
from tools.scale_wave17_probe import run
from tools.scale_wave31_probe import synth_emb


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        app_name="scale_wave31b_probe", master="local[32]",
        shuffle_partitions=32,
    )
    for n in scales:
        emb = synth_emb(spark, 60_000 * n)
        legs: dict = {}
        res = {"scale": n, "vecs": 60_000 * n}
        legs["rank_metrics"] = run(
            f"rank_metrics {n}x", rank_metrics_frame(emb)
        )
        legs["rank_metrics_sampled"] = run(
            f"rank_metrics_sampled {n}x", rank_metrics_sampled_frame(emb)
        )
        legs["pr_curve"] = run(f"pr_curve {n}x", pr_curve_frame(emb))
        legs["pr_curve_sampled"] = run(
            f"pr_curve_sampled {n}x", pr_curve_sampled_frame(emb)
        )
        record("wave31b", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
