"""Scaling probe: drive the sessionize / funnel / rolling-WAU family
through the custom Python DataSource at 1x / 10x / 100x the sf0.1
events volume (100k -> 1M -> 10M rows), measuring wall-time per
operator per scale.

This is measured (not argued) evidence that the window/state operators
scale linearly past the largest on-disk fixture: the synthetic source
generates a seeded events table of any size executor-side (no driver
funnel, no disk), users scale with rows (so per-user partitions stay
bounded — the shape a real event stream has), and each operator runs
the EXACT registered-query code (ops.asof.session_stats,
workload.final_wave.funnel_frame, workload.quality.wau_sketch_frame).

Usage: python tools/scale_events_probe.py [--scales 1,10,100]
Prints one JSON line per scale plus a linearity summary; paste results
into SCALING.md (the committed numbers there came from this tool).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.scaling_record import record  # noqa: E402

from etl_neotel_sql_automation_spark.ops.asof import session_stats
from etl_neotel_sql_automation_spark.session import get_spark
from etl_neotel_sql_automation_spark.workload.final_wave import funnel_frame
from etl_neotel_sql_automation_spark.workload.insights import (
    ab_test_frame,
    lifecycle_frame,
    markov_frame,
)
from etl_neotel_sql_automation_spark.workload.quality import wau_sketch_frame

BASE_ROWS = 100_000   # sf0.1 events volume
BASE_USERS = 1_000    # sf0.1 user cardinality


def events_at(spark, scale: int):
    """Events-shaped frame at ``scale``x sf0.1 volume from the Python
    DataSource: rows and users both scale (fixed users at growing rows
    would fatten per-user window partitions — not how event data
    grows); 30-day window and partition count ~ defaultParallelism."""
    return (
        spark.read.format("synthetic_events")
        .option("rows", BASE_ROWS * scale)
        .option("users", BASE_USERS * scale)
        .option("partitions", max(spark.sparkContext.defaultParallelism, 4))
        .option("seed", 7)
        .load()
    )


OPS = {
    "sessionize": lambda ev: session_stats(ev, gap_minutes=30.0),
    "funnel": funnel_frame,
    "rolling_wau_sketch": wau_sketch_frame,
    "markov_transitions": markov_frame,
    "lifecycle_weekly": lifecycle_frame,
    "ab_test_readout": ab_test_frame,
}


def main() -> None:
    scales = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]

    spark = get_spark(app_name="scale_events_probe")
    from etl_neotel_sql_automation_spark.py_datasource import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)

    # Warm the session + Python worker pool off the measured path
    events_at(spark, 1).limit(1000).write.mode("overwrite").format("noop").save()

    results: dict[int, dict[str, float]] = {}
    for scale in scales:
        ev = events_at(spark, scale)
        times: dict[str, float] = {}
        for name, op in OPS.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                op(ev).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 2)
        results[scale] = times
        record("events", scale, times)
        print(json.dumps({"scale": scale, "rows": BASE_ROWS * scale, **times}))

    if len(results) > 1:
        base = results[scales[0]]
        for s in scales[1:]:
            ratios = {
                k: round(results[s][k] / base[k] / (s / scales[0]), 2)
                for k in OPS
            }
            # 1.0 = perfectly linear in rows; <1 = sublinear (fixed
            # overhead amortizing); >1 = superlinear (a scale problem)
            print(json.dumps({"linearity_vs_rows": ratios, "scale": s}))
    spark.stop()


if __name__ == "__main__":
    main()
