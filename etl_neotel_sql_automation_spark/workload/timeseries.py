"""Time-series workload: hypertable-style rollup + gap-fill +
interpolation over the events stream (ops.timeseries).

The interpolation arithmetic runs on exact integer epoch-seconds and
pre-rounded bucket averages on BOTH engines, so the filled values are
bit-identical and the driver's value hash can bind."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import query, table
from ..ops import timeseries as TS


@query(
    "timeseries_gapfill",
    oracle="""
    WITH agg AS (
      SELECT event_type AS series_key, date_trunc('hour', ts) AS bucket,
             sum(CAST(round(value * 1000000) AS BIGINT)) AS s,
             count(*) AS n_obs
      FROM events GROUP BY 1, 2
    ),
    actual AS (
      SELECT series_key, bucket,
             ((2 * s + n_obs) // (2 * n_obs)) / 1000000.0 AS v, n_obs
      FROM agg
    ),
    bounds AS (
      SELECT series_key, min(bucket) AS lo, max(bucket) AS hi
      FROM actual GROUP BY 1
    ),
    grid AS (
      SELECT series_key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ),
    filled AS (
      SELECT g.series_key, g.bucket, a.v
      FROM grid g LEFT JOIN actual a
        ON g.series_key = a.series_key AND g.bucket = a.bucket
    ),
    win AS (
      SELECT series_key, bucket, v,
        last_value(CASE WHEN v IS NOT NULL THEN
            struct_pack(t := epoch_us(bucket)//1000000, val := v) END IGNORE NULLS)
          OVER (PARTITION BY series_key ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS prev,
        first_value(CASE WHEN v IS NOT NULL THEN
            struct_pack(t := epoch_us(bucket)//1000000, val := v) END IGNORE NULLS)
          OVER (PARTITION BY series_key ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM filled
    )
    SELECT series_key, bucket,
      CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
      round(CASE WHEN v IS NOT NULL THEN v
                 WHEN prev IS NULL THEN nxt.val
                 WHEN nxt IS NULL THEN prev.val
                 ELSE prev.val + (nxt.val - prev.val) *
                      ((epoch_us(bucket)//1000000 - prev.t)
                       / CAST(nxt.t - prev.t AS DOUBLE))
            END, 6) AS v_interp,
      round(prev.val, 6) AS v_locf
    FROM win
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the events stream: hourly avg-rollup per event_type,
    densified onto the full hourly grid (sequence+explode per key's own
    bounds), gaps filled by LOCF and by linear interpolation between
    the surrounding observations. ~6% of sf0.01 grid hours are real
    gaps, so both fill paths are exercised. The reference exports dense
    pivot grids (main.py:391-470) but cannot densify time — this is the
    hypertable capability layered on top."""
    return TS.resample(
        table(spark, sf_dir, "events"), "event_type", "ts", "value"
    )
