"""The schema-conformance operator: normalize -> rename -> pad ->
project -> coerce -> key-filter, as one reusable DataFrame transform.

Re-expresses ``transformar_conducta_agentes`` (main.py:1207-1261) and
``transformar_estados_operativos`` (main.py:1264-1308) — the cleanest
seam in the reference: a pure DataFrame -> DataFrame function — driven
by a :class:`~etl_neotel_sql_automation_spark.schema.ConformSpec`.

Scale notes (100 TB posture): every step is a *narrow* transformation —
column renames, expressions, and filters compose into a single
projection over the scan; no shuffle is introduced, and Catalyst prunes
unreferenced source columns down to the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import (
    clean_name,
    date_dayfirst,
    float0,
    int0,
    time_str_to_minutes,
)
from .schema import ConformSpec


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P-1: clean every column name (main.py:1222, 1278). Collisions
    after cleaning get a positional suffix — pandas would silently
    create duplicate labels; Spark cannot, and the suffix keeps the
    data instead of corrupting it."""
    cleaned = [clean_name(c) for c in df.columns]
    seen: dict[str, int] = {}
    out = []
    for c in cleaned:
        if c in seen:
            seen[c] += 1
            out.append(f"{c}_{seen[c]}")
        else:
            seen[c] = 0
            out.append(c)
    return df.toDF(*out)


def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """P-5: ``dropna(how='all')`` right after read (main.py:1352)."""
    return df.na.drop(how="all")


def conform(df: DataFrame, spec: ConformSpec, *, add_load_date: bool = False) -> DataFrame:
    """Conform an arbitrarily-shaped source DataFrame to ``spec``.

    Steps (numbering mirrors main.py:1219-1258):

    1. normalize column names (P-1)
    2. apply the rename map (P-2)
    3. null-pad missing target columns (P-3)
    4. project to exactly the target columns, in order (P-4)
    5. coerce: dates day-first (T-1), ints else 0 (T-2), floats else
       0.0 (T-3), time strings -> decimal minutes (T-4/T-5)
    6. drop rows with null keys (P-6) — *after* coercion, as in the
       reference, so 0-defaulted numeric keys never drop
    """
    df = normalize_column_names(df)

    rename = {k: v for k, v in spec.rename_map.items() if k in df.columns}
    if rename:
        df = df.withColumnsRenamed(rename)

    missing = [c for c in spec.final_cols if c not in df.columns]
    if missing:
        df = df.withColumns({c: F.lit(None).cast("string") for c in missing})

    df = df.select(*spec.final_cols)

    # Columns we just null-padded are all-null by construction, so each
    # coercion collapses to its null-input constant (time/int/float -> 0,
    # date -> null). Emitting the constant directly keeps semantics
    # identical while shrinking the expression tree ~6x on wide specs
    # (estados: 22 of 26 time columns are padded) — Catalyst ANALYSIS of
    # the when-chain forest, rebuilt per query, was the dominant cost.
    padded = set(missing)
    coercions = {}
    for c in spec.date_cols:
        coercions[c] = F.lit(None).cast("date") if c in padded else date_dayfirst(c)
    for c in spec.int_cols:
        coercions[c] = F.lit(0).cast("int") if c in padded else int0(c)
    for c in spec.float_cols:
        coercions[c] = F.lit(0.0) if c in padded else float0(c)
    for c in spec.time_cols:
        coercions[c] = F.lit(0.0) if c in padded else time_str_to_minutes(c)
    df = df.withColumns(coercions)

    if spec.key_cols:
        df = df.na.drop(subset=[c for c in spec.key_cols if c in spec.final_cols])

    if add_load_date:
        # S-7 audit column (DDL DEFAULT GETDATE(), main.py:1400, 1439)
        df = df.withColumn("load_date", F.current_timestamp())
    return df


def conform_with_quarantine(
    df: DataFrame, spec: ConformSpec
) -> tuple[DataFrame, DataFrame]:
    """Conform, routing rejected rows to a quarantine DataFrame instead
    of silently dropping them.

    Replaces the reference's per-row salvage (R-2, main.py:1555-1569 —
    failed inserts silently discarded): with Spark-side ``try_*``
    coercion the only reject class left is a null key, and those rows
    are *kept*, tagged with ``reject_reason``, for a quarantine sink
    (the ``badRecordsPath`` pattern applied to semantic rejects).

    Returns ``(good, quarantined)``; ``good`` equals :func:`conform`'s
    output; ``quarantined`` has the same schema plus ``reject_reason``.
    """
    unfiltered = conform(df, spec.no_key_filter())
    reason = F.concat_ws(
        ",",
        *[
            F.when(F.col(c).isNull(), F.lit(f"null_key:{c}"))
            for c in spec.key_cols
            if c in spec.final_cols
        ],
    )
    tagged = unfiltered.withColumn(
        "reject_reason", F.when(reason != "", reason)
    )
    good = tagged.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    bad = tagged.filter(F.col("reject_reason").isNotNull())
    return good, bad
