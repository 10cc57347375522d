"""Scale probe for the r8 wave-41 composed experiment pipeline
(1x/10x/100x synthetic events — the wave-31 generator, so the numbers
sit beside the existing SCALING.md event-family rows).

Usage: python tools/scale_wave41_probe.py [--scales=1,10,100]
Writes one JSON line per scale to stdout (redirect to a file).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave41 import (
    experiment_pipeline_frame,
)
from tools.scale_wave17_probe import run
from tools.scale_wave31_probe import synth_events


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        app_name="scale_wave41_probe", master="local[32]",
        shuffle_partitions=32,
    )
    for n in scales:
        ev = synth_events(spark, 200_000 * n).localCheckpoint()
        res = {"scale": n, "events": 200_000 * n}
        res["experiment_e2e"] = run(
            f"experiment_e2e {n}x", experiment_pipeline_frame(ev)
        )
        print(json.dumps(res), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
