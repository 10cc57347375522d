"""As-of join and sessionization — the two time-series operators Spark
lacks natively (guide: "As-of / range join" / "Sessionization").

Both are built as *single-shuffle window* plans, not join-amplification
plans:

- ``asof_join`` merges the two sides into one stream (union + tag),
  sorts each key partition once, and carries the most recent right-side
  row forward with ``last(..., ignorenulls)``. Cost: one shuffle of
  |left| + |right| rows — no per-pair blowup regardless of how many
  right rows precede each left row. This is the shape that survives
  100 TB; the equi-join + row_number alternative amplifies by the
  average match count.
- ``sessionize`` is the classic lag-gap -> cumulative-sum window pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_vals: list[str],
    tolerance: None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` on the same key (direction='backward'),
    or the earliest right row with ``right_time >= left_time``
    (direction='forward').

    Both directions are the same single-shuffle union-merge plan; the
    forward pass just iterates each key partition in descending time
    order, so "most recently seen right row" becomes "nearest future
    right row". Ties on ``right_time`` resolve to the greatest
    ``right_vals`` tuple in both directions (lexicographic,
    deterministic). Right columns are null when no right row
    precedes/follows.

    All ``right_vals`` travel as ONE struct carried by a single
    ``last(ignorenulls)``: the attached values always come from the
    same right row, even when individual right columns contain nulls
    (per-column carries could mix columns from different rows).
    """
    if direction not in ("backward", "forward"):
        raise NotImplementedError("direction must be 'backward' or 'forward'")
    from pyspark.sql import types as T

    lcols = left.columns
    rv_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in right_vals])
    # tag: right rows sort before left rows at equal time (<= semantics);
    # among right ties, the greatest right_vals struct wins the carry.
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*right_vals).alias("__rv"),
        *[F.lit(None).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(  # noqa: E741
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rv_type).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        W.partitionBy("__k")
        .orderBy(t_order, "__is_left", "__rv")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = r.unionByName(l).select(
        "*", F.last("__rv", ignorenulls=True).over(w).alias("__a")
    )
    return merged.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"__a.{c}").alias(c) for c in right_vals],
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event on the same key exceeds ``gap_minutes``. Pure
    integer-microsecond arithmetic so external oracles agree exactly."""
    w = W.partitionBy(key_col).orderBy(time_col, order_tiebreak)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prev = F.lag(F.unix_micros(F.col(time_col))).over(w)
    new_sess = (
        F.when(prev.isNull() | (F.unix_micros(F.col(time_col)) - prev > gap_us), 1)
        .otherwise(0)
    )
    run = W.partitionBy(key_col).orderBy(time_col, order_tiebreak).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return events.withColumn("session_id", F.sum(new_sess).over(run).cast("int"))


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregates: event count and duration (microseconds)."""
    s = sessionize(events, key_col, time_col, gap_minutes=gap_minutes)
    return s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_micros(F.max(time_col)) - F.unix_micros(F.min(time_col))
        ).alias("duration_us"),
    )
