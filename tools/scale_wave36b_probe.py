"""Scale probe for the r8 deployed-write layout meter: times the
wave-36 simulation (global row_number — the documented single-task
sort) against io_hilbert_layout_deployed's bucket-local shape on the
same 1x/10x/100x synthetic orders, and records the pruning ladder
(files_scanned per layout) both shapes measure.

Usage: python tools/scale_wave36b_probe.py [--scales=1,10,100]
Writes one JSON line per scale to stdout (redirect to a file).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.wave36 import (
    hilbert_layout_deployed_frame,
    hilbert_layout_frame,
)
from tools.scale_wave17_probe import run
from tools.scale_wave31_probe import synth_orders_like


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(
        app_name="scale_wave36b_probe", master="local[32]",
        shuffle_partitions=32,
    )
    for n in scales:
        orders = synth_orders_like(spark, 60_000 * n).localCheckpoint()
        legs: dict = {}
        res = {"scale": n, "rows": 60_000 * n}
        legs["simulation"] = run(
            f"layout_sim {n}x", hilbert_layout_frame(orders)
        )
        legs["deployed"] = run(
            f"layout_deployed {n}x", hilbert_layout_deployed_frame(orders)
        )
        res["ladder"] = {
            r["layout"]: [r["n_files"], r["files_scanned"]]
            for r in hilbert_layout_deployed_frame(orders).collect()
        }
        record("wave36b", res["scale"], legs)
        print(json.dumps({**res, **legs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
