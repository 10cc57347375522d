"""Round-9 wave-76 workloads:

- timeseries_spectral_peaks — single-frequency DFT power of the daily
  order-count series at candidate seasonal periods (weekly, monthly):
  the "which cadence dominates this series" readout behind pipeline
  scheduling and seasonality-aware sampling. The registry has ACF/PACF
  (lag domain); this is the frequency-domain member, and the first —
  trig functions cannot be trusted across libms, so the cos/sin
  weights are PRECOMPUTED IN PYTHON at each period's phase (7 and 30
  values), quantized to milli-units, and inlined as the SAME array
  literals into the Spark plan and the oracle SQL. Every engine-side
  operation is then integer multiply/sum plus one final IEEE double
  expression (the wave-53 Pearson precedent).
- multimodal_phash_threshold_sweep — the dedup_threshold_sweep twin
  for the image ladder: ONE banded candidate join, then the caught-
  pair count at every Hamming radius 0..10 from a single pass — how
  the near-dup verdict would move if the radius knob moved, without
  re-running candidates.

Scale shape: the spectral series lives on the bounded day grid
(combinable count per epoch-day, then a literal-array projection); the
sweep is the standard banded-LSH candidate join followed by a
<=61-row cumulative window.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table
from .multimodal_extra import (
    SQL_AHASH,
    SQL_BANDED_CAND,
    ahash_frame,
    banded_candidate_occurrences,
)

_EPOCH = "1992-01-01"
_PERIODS = (7, 30)
_TRIG_SCALE = 1000  # milli-quantized literal weights


def _weights(period: int) -> tuple[list[int], list[int]]:
    """cos/sin weights for each phase 0..period-1, milli-quantized —
    computed HERE (one libm, the driver's) and inlined as literals
    into both engines."""
    cs = [
        round(math.cos(2 * math.pi * p / period) * _TRIG_SCALE)
        for p in range(period)
    ]
    sn = [
        round(math.sin(2 * math.pi * p / period) * _TRIG_SCALE)
        for p in range(period)
    ]
    return cs, sn


def spectral_peaks_frame(orders: DataFrame) -> DataFrame:
    """Frame core of timeseries_spectral_peaks (scaling-probe entry)."""
    daily = (
        orders.select(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date")
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    parts = []
    for period in _PERIODS:
        cs, sn = _weights(period)
        c_arr = ", ".join(str(v) for v in cs)
        s_arr = ", ".join(str(v) for v in sn)
        part = daily.select(
            F.lit(period).cast("bigint").alias("period"),
            "n",
            F.expr(
                f"n * element_at(array({c_arr}), CAST(d % {period} AS INT) + 1)"
            ).alias("cw"),
            F.expr(
                f"n * element_at(array({s_arr}), CAST(d % {period} AS INT) + 1)"
            ).alias("sw"),
        ).groupBy("period").agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("n").cast("bigint").alias("n_orders"),
            F.sum("cw").cast("bigint").alias("c_milli"),
            F.sum("sw").cast("bigint").alias("s_milli"),
        )
        parts.append(part)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.select(
        "period",
        "n_days",
        "n_orders",
        "c_milli",
        "s_milli",
        # exact-integer inputs -> one IEEE double expression, round 6
        # (the wave-53 Pearson recipe): mean-square spectral amplitude
        # per day, normalized by the milli weight scale
        F.expr(
            "round((c_milli * 1.0e0 * c_milli + s_milli * 1.0e0 * s_milli)"
            f" / ({float(_TRIG_SCALE) ** 2} * n_days * n_days), 6)"
        ).alias("power_per_day2"),
    ).orderBy("period")


def _spectral_oracle() -> str:
    legs = []
    for period in _PERIODS:
        cs, sn = _weights(period)
        c_arr = ", ".join(str(v) for v in cs)
        s_arr = ", ".join(str(v) for v in sn)
        legs.append(f"""
      SELECT CAST({period} AS BIGINT) AS period,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(n) AS BIGINT) AS n_orders,
             CAST(sum(n * ([{c_arr}])[CAST(d % {period} AS INTEGER) + 1])
                  AS BIGINT) AS c_milli,
             CAST(sum(n * ([{s_arr}])[CAST(d % {period} AS INTEGER) + 1])
                  AS BIGINT) AS s_milli
      FROM daily""")
    union = "\n      UNION ALL".join(legs)
    return f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE)) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    legs AS ({union}
    )
    SELECT period, n_days, n_orders, c_milli, s_milli,
           round((c_milli * 1.0 * c_milli + s_milli * 1.0 * s_milli)
                 / ({float(_TRIG_SCALE) ** 2} * n_days * n_days), 6)
             AS power_per_day2
    FROM legs
    ORDER BY period
    """


@query("timeseries_spectral_peaks", oracle=_spectral_oracle())
def timeseries_spectral_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT power of the daily order-count series at
    the weekly and monthly candidate periods: cos/sin weights
    milli-quantized in Python and inlined as identical literals into
    both engines, exact integer sums, one final double expression —
    the frequency-domain seasonality readout beside the lag-domain
    ACF/PACF."""
    return spectral_peaks_frame(table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# multimodal_phash_threshold_sweep — one candidate join, every radius.
# ---------------------------------------------------------------------------

_SWEEP_MAX = 10


def phash_threshold_sweep_frame(docs: DataFrame) -> DataFrame:
    """Frame core of multimodal_phash_threshold_sweep
    (scaling-probe entry)."""
    per_h = (
        banded_candidate_occurrences(ahash_frame(docs))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
        .select(F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)").alias("hamming"))
        .groupBy("hamming")
        .agg(F.count("*").cast("bigint").alias("n_at"))
    )
    radii = docs.sparkSession.range(0, _SWEEP_MAX + 1).select(
        F.col("id").cast("bigint").alias("radius")
    )
    return (
        radii.join(per_h, per_h["hamming"] <= radii["radius"], "left")
        .groupBy("radius")
        .agg(
            F.coalesce(F.sum("n_at"), F.lit(0))
            .cast("bigint")
            .alias("n_pairs")
        )
        .orderBy("radius")
    )


@query(
    "multimodal_phash_threshold_sweep",
    oracle=SQL_AHASH
    + SQL_BANDED_CAND
    + f""",
    cand AS (
      SELECT DISTINCT id_a, id_b, ha, hb FROM cand_k
    ),
    per_h AS (
      SELECT CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
             CAST(count(*) AS BIGINT) AS n_at
      FROM cand GROUP BY 1
    )
    SELECT CAST(r.r AS BIGINT) AS radius,
           CAST(coalesce(sum(n_at), 0) AS BIGINT) AS n_pairs
    FROM (SELECT unnest(range({_SWEEP_MAX} + 1)) AS r) r
    LEFT JOIN per_h ON per_h.hamming <= r.r
    GROUP BY r.r
    ORDER BY radius
    """,
)
def multimodal_phash_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Radius sweep for pHash image dedup: candidate pairs from ONE
    banded join, bucketed by exact Hamming distance, then the caught
    count at every radius 0..10 off a bounded cumulative join — how
    the dedup verdict moves with the radius knob, without re-running
    candidates (the dedup_threshold_sweep precedent for the image
    modality)."""
    return phash_threshold_sweep_frame(table(spark, sf_dir, "documents"))
