"""Time-series regularization operators: bucketed rollup, gap filling,
last-observation-carried-forward, and linear interpolation.

The reference has no time-series surface (its grids are dense exports,
main.py:391-470); this is the hypertable-rollup capability a
training-data / telemetry pipeline needs at scale.

100 TB design notes:

- The dense grid is generated per key from that key's own [min, max]
  bucket range (``sequence`` + ``explode``) — grid size is
  O(keys x buckets), never O(rows), and generation is a projection on
  the already-aggregated per-key bounds (tiny), not on the fact table.
- Gap filling is ONE left join on (key, bucket) — both sides hash
  partition on the same compound key, and the actuals side has already
  been reduced by the rollup, so the join is aggregate-sized, not
  fact-sized.
- LOCF/interpolation are two window passes over the grid partitioned
  by key — state per partition is one struct, and Spark's window
  operator spills sorted runs, so a key with years of buckets does not
  need to fit in memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def rollup_buckets(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    granularity: str = "hour",
) -> DataFrame:
    """Aggregate a raw event stream to one row per (key, time bucket):
    ``avg`` of the value at 6-decimal precision, computed in EXACT
    integer micro-units. Float sums are order-dependent — at sf0.1 a
    1-ulp drift between engines flipped a round() boundary — so the
    value is quantized to round(v*1e6) bigints, summed exactly, and
    the mean is taken with integer round-half-up ((2s+n) div 2n, valid
    for the non-negative values this op serves). Bit-identical in any
    engine, any partitioning.

    One map-side-combinable hash aggregate — the standard first stage
    of any rollup at scale.
    """
    iv = F.round(F.col(val_col) * 1_000_000).cast("long")
    agg = (
        df.groupBy(
            F.col(key_col).alias("series_key"),
            F.date_trunc(granularity, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.sum(iv).alias("s"),
            F.count("*").alias("n_obs"),
        )
    )
    v_int = F.expr("(2 * s + n_obs) div (2 * n_obs)")
    return agg.select(
        "series_key",
        "bucket",
        (v_int / 1_000_000).alias("v"),
        "n_obs",
    )


def gapfill(
    actual: DataFrame,
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Densify a rolled-up series (series_key, bucket, v) onto a
    regular grid and fill the holes two ways:

    - ``v_locf``: last observation carried forward (null before the
      first observation),
    - ``v_interp``: linear interpolation between the surrounding
      observations (edges clamp to the nearest observation).

    ``observed`` marks real rows. Interpolation runs on exact integer
    epoch-seconds, so the arithmetic is bit-reproducible across
    engines.
    """
    bounds = actual.groupBy("series_key").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "series_key",
        F.explode(F.sequence("lo", "hi", F.expr(step))).alias("bucket"),
    )
    filled = grid.join(actual, ["series_key", "bucket"], "left")

    w_prev = (
        W.partitionBy("series_key").orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("series_key").orderBy("bucket").rowsBetween(0, W.unboundedFollowing)
    )
    obs = F.when(
        F.col("v").isNotNull(),
        F.struct(
            F.col("bucket").cast("long").alias("t"),
            F.col("v").alias("val"),
        ),
    )
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)

    t_here = F.col("bucket").cast("long")
    ratio = (t_here - prev["t"]) / (nxt["t"] - prev["t"]).cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev.isNull(), nxt["val"])
        .when(nxt.isNull(), prev["val"])
        .otherwise(prev["val"] + (nxt["val"] - prev["val"]) * ratio)
    )
    return filled.select(
        "series_key",
        "bucket",
        F.when(F.col("v").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("observed"),
        F.round(interp, 6).alias("v_interp"),
        F.round(prev["val"], 6).alias("v_locf"),
    )


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    granularity: str = "hour",
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """rollup_buckets |> gapfill — raw events to a dense regular grid
    with interpolated values, the end-to-end resample pipeline."""
    return gapfill(rollup_buckets(df, key_col, ts_col, val_col, granularity), step)
