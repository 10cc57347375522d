"""Round-7 wave-33 workload: Croston intermittent-demand forecasting —
the holt_linear sibling for SPARSE series. Holt smooths a dense daily
count; supply-chain demand for a single part is mostly zeros with
occasional spikes, where classical smoothing collapses toward zero
between events. Croston's method smooths the nonzero demand SIZES and
the INTER-DEMAND INTERVALS separately and forecasts their ratio; the
Syntetos-Boylan approximation (SBA) scales by (1 - alpha/2) to undo
Croston's positive bias.

Exact integer recurrence (micro units, dyadic alpha = 1/4):
  on the k-th demand event (size q_k, interval I_k days since the
  previous event; seeds z_1 = q_1*S, p_1 = S i.e. one day):
    z_k = z + (q_k*S - z) div 4
    p_k = p + (I_k*S - p) div 4
  croston_micro = (z * S) div p;  sba_micro = (7 * croston) div 8
folded left-to-right over each part's day-ordered demand support with
F.aggregate (the holt_linear precedent — the support is bounded by the
date domain, so the fold is a scalar expression, not a row recursion);
DuckDB replays the identical recurrence as one multi-series recursive
CTE keyed by part. Both `div`s truncate toward zero identically on
negatives (the holt_linear verification).

Scale notes: one (part, day) aggregate (map-side combinable), one
collect_list per part bounded by the date domain, zero joins. The
literal part filter keeps the registered query's output readable; the
frame core takes any lineitem-shaped input and recurses every part in
one pass — at 100 TB the same plan runs per-part across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

_CR_S = 1_000_000
_CR_PARTS = 8  # literal bound for the registered query's output


def croston_frame(lineitem: DataFrame) -> DataFrame:
    """Frame core of timeseries_croston (scaling-probe entry): one
    Croston/SBA row per part present in the input."""
    daily = (
        lineitem.select(
            "l_partkey",
            F.date_trunc("day", F.col("l_shipdate")).cast("date").alias("day"),
            F.col("l_quantity"),
        )
        .groupBy("l_partkey", "day")
        # round before the BIGINT cast: Spark's double->bigint cast
        # truncates while DuckDB's rounds half away from zero, so the
        # engines would diverge on any non-integral daily sum (r7
        # ADVICE) — TPC-H quantities are integral, but the frame core
        # accepts arbitrary lineitem-shaped input
        .agg(F.expr("CAST(round(sum(l_quantity)) AS BIGINT)").alias("q"))
    )
    series = daily.groupBy("l_partkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.datediff("day", F.lit("1992-01-01")).alias("d"), "q")
            )
        ).alias("seq"),
        F.count("*").cast("bigint").alias("n_demands"),
    )
    folded = series.select(
        "l_partkey",
        "n_demands",
        F.expr(
            f"""
            aggregate(
              slice(seq, 2, greatest(cast(size(seq) as int) - 1, 0)),
              named_struct(
                'z', seq[0].q * CAST({_CR_S} AS BIGINT),
                'p', CAST({_CR_S} AS BIGINT),
                'prev', CAST(seq[0].d AS BIGINT)),
              (acc, e) -> named_struct(
                'z', acc.z + (e.q * {_CR_S} - acc.z) div 4,
                'p', acc.p + ((e.d - acc.prev) * {_CR_S} - acc.p) div 4,
                'prev', CAST(e.d AS BIGINT))
            )
            """
        ).alias("st"),
    )
    return folded.select(
        "l_partkey",
        "n_demands",
        F.col("st.z").alias("size_micro"),
        F.col("st.p").alias("interval_micro"),
        F.expr(f"(st.z * CAST({_CR_S} AS BIGINT)) div st.p").alias(
            "croston_micro"
        ),
        F.expr(
            f"(7 * ((st.z * CAST({_CR_S} AS BIGINT)) div st.p)) div 8"
        ).alias("sba_micro"),
    ).orderBy("l_partkey")


def _croston_oracle() -> str:
    return f"""
    WITH daily AS (
      SELECT l_partkey,
             CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             CAST(round(sum(l_quantity)) AS BIGINT) AS q
      FROM lineitem WHERE l_partkey < {_CR_PARTS}
      GROUP BY 1, 2
    ),
    seq AS (
      SELECT l_partkey,
             row_number() OVER (PARTITION BY l_partkey ORDER BY day) AS i,
             CAST(date_diff('day', DATE '1992-01-01', day) AS BIGINT) AS d,
             q
      FROM daily
    ),
    n AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_demands
      FROM seq GROUP BY 1
    ),
    r AS (
      WITH RECURSIVE rec(l_partkey, i, z, p, prev) AS (
        SELECT l_partkey, CAST(1 AS BIGINT), q * {_CR_S},
               CAST({_CR_S} AS BIGINT), d
        FROM seq WHERE i = 1
        UNION ALL
        SELECT rec.l_partkey, rec.i + 1,
               rec.z + (seq.q * {_CR_S} - rec.z) // 4,
               rec.p + ((seq.d - rec.prev) * {_CR_S} - rec.p) // 4,
               seq.d
        FROM rec JOIN seq
          ON seq.l_partkey = rec.l_partkey AND seq.i = rec.i + 1
      )
      SELECT l_partkey, z, p FROM (
        SELECT rec.*, row_number() OVER (
          PARTITION BY l_partkey ORDER BY i DESC) AS rr
        FROM rec
      ) WHERE rr = 1
    )
    SELECT n.l_partkey, n.n_demands,
           r.z AS size_micro,
           r.p AS interval_micro,
           (r.z * {_CR_S}) // r.p AS croston_micro,
           (7 * ((r.z * {_CR_S}) // r.p)) // 8 AS sba_micro
    FROM n JOIN r ON n.l_partkey = r.l_partkey
    ORDER BY n.l_partkey
    """


@query("timeseries_croston", oracle=_croston_oracle())
def timeseries_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston/SBA intermittent-demand forecast per part (literal part
    set): smoothed demand size and inter-demand interval (micro) and
    their ratio as the per-day demand-rate forecast."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < _CR_PARTS
    )
    return croston_frame(li)
