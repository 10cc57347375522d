"""MERGE / upsert emulation without a transactional table format.

Parquet (unlike Delta/Iceberg, whose jars are not in this
environment) has no MERGE INTO; the standard emulation is
anti-join + union:

- ``upsert``: target rows not matched by an update key survive,
  update rows win — one shuffle each side on the key.
- ``scd2_apply``: slowly-changing-dimension type 2 — matched keys get
  their current row closed (valid_to set) and a new open row appended;
  history rows pass through untouched.

At scale both are key-partitioned joins: broadcast the updates side
when it is batch-sized (the common CDC case), which makes upsert a
shuffle-free map-side operation over the snapshot scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT, emulated:
    ``(target ANTI JOIN updates ON key) UNION ALL updates``."""
    keys = [key] if isinstance(key, str) else list(key)
    upd = F.broadcast(updates) if broadcast_updates else updates
    survivors = target.join(upd, on=keys, how="left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    effective_col: str = "valid_from",
    expiry_col: str = "valid_to",
    current_flag: str = "is_current",
    now: Column | None = None,
) -> DataFrame:
    """SCD type-2 merge: close the current row of every matched key and
    append the update as the new current row.

    ``dim`` must carry (effective_col, expiry_col, current_flag);
    ``updates`` carries the business columns + key. ``now`` defaults to
    current_timestamp — inject a literal for deterministic tests.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ts = now if now is not None else F.current_timestamp()

    upd_keys = updates.select(*keys).distinct()
    matched_current = (
        dim.filter(F.col(current_flag))
        .join(F.broadcast(upd_keys), on=keys, how="left_semi")
    )
    closed = matched_current.withColumn(expiry_col, ts).withColumn(
        current_flag, F.lit(False)
    )
    untouched = dim.join(
        F.broadcast(upd_keys.withColumn("__m", F.lit(1))), on=keys, how="left"
    ).filter(F.col("__m").isNull() | ~F.col(current_flag)).drop("__m")
    fresh = (
        updates.withColumn(effective_col, ts)
        .withColumn(expiry_col, F.lit(None).cast("timestamp"))
        .withColumn(current_flag, F.lit(True))
    )
    return untouched.unionByName(closed).unionByName(fresh)
