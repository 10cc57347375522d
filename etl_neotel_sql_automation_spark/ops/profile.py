"""Column profiling — the "look at the data before you trust it" op
every pipeline runs first against a new source.

One aggregation pass computes, for every requested column: non-null
count, null count, distinct count, and min/max (rendered as strings so
heterogeneous columns share one output schema). The single-row
aggregate is then exploded into one row per column — the profile costs
ONE scan + a constant-size result regardless of table width or row
count.

Scale posture: with ``approx=True`` (the 100 TB default) distinct
counts use HyperLogLog (``approx_count_distinct``), whose partial
state is a fixed-size sketch per (task, column) — no distinct-value
shuffle at all. ``approx=False`` uses exact ``count(DISTINCT)``
(Spark's expand + two-level partial-distinct aggregation: shuffle
volume is the per-partition-deduped distinct values, the floor for an
exact answer) and exists so the differential oracle can reproduce the
numbers bit-for-bit.

Reference parity: the reference eyeballs dataframes via logging row
counts only (main.py:1260, 1307); this op is that observability need
grown to engine scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = True
) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in one aggregation
    pass. Returns one row per column:

    ``column, non_null_count, null_count, distinct_count, min_value,
    max_value`` (min/max cast to string in the column's natural
    ordering — numeric columns compare numerically, then render).
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs = []
    for c in names:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nu_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
        if approx:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").alias("non_null_count"),
                F.col(f"__nu_{c}").alias("null_count"),
                *(
                    [F.col(f"__nd_{c}").alias("distinct_count")]
                    if approx
                    else []
                ),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in names
        ]
    )
    base = one.select(F.explode(rows).alias("p")).select("p.*")
    if approx:
        return base
    # r12 (guide §2.3): N countDistinct aggregates in ONE groupBy plan
    # through Expand — every row duplicated N+1 ways and the min/max/
    # count buffers dragged through the two-level distinct aggregation
    # (the agg_approx_stats disease; measured 4.3 s on the 9-column
    # orders profile vs 1.2 s split). The exact path now runs the
    # plain aggregates in one pass and each column's exact distinct as
    # its own column-pruned two-level aggregation (groupBy(value) ->
    # count, null group filtered to match countDistinct), unioned and
    # joined back on the column name. At scale each per-column pass
    # scans ONE column of a columnar file — the same bytes the Expand
    # row would have carried — and the production default (approx=True,
    # fixed-size HLL sketches, zero distinct shuffle) is unchanged.
    ds = None
    for c in names:
        d = (
            df.select(F.col(c).alias("v"))
            .where(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.lit(1))
            .agg(F.count("*").alias("distinct_count"))
            .select(F.lit(c).alias("column"), "distinct_count")
        )
        ds = d if ds is None else ds.unionAll(d)
    return base.join(ds, "column").select(
        "column",
        "non_null_count",
        "null_count",
        "distinct_count",
        "min_value",
        "max_value",
    )


def schema_drift(old, new) -> dict[str, list]:
    """Schema-drift report between two schema snapshots (StructTypes
    or schema-bearing DataFrames): added columns, removed columns, and
    type changes — the metadata half of change detection beside
    cdc_snapshot_diff's row half. At 100 TB an upstream producer
    silently widening an int or dropping a column is the single most
    common pipeline breaker; run this at every ingest boundary and
    gate the load on an empty report (or route to conform's null-pad
    path for the tolerated cases).

    Returns {"added": [(name, type)], "removed": [(name, type)],
    "retyped": [(name, old_type, new_type)]} with names compared
    case-insensitively (Spark's resolution default) in deterministic
    name order. Pure metadata — no jobs run.

    Raises ValueError if either schema holds columns that differ only
    by case (legal under spark.sql.caseSensitive=true): folding them
    into one lowercase key would silently drop a field from the
    comparison, and a drift report a load gate relies on must never
    be silently incomplete.
    """
    o = old.schema if isinstance(old, DataFrame) else old
    n = new.schema if isinstance(new, DataFrame) else new
    for label, schema in (("old", o), ("new", n)):
        seen: dict[str, str] = {}
        for f in schema.fields:
            k = f.name.lower()
            if k in seen:
                raise ValueError(
                    f"schema_drift: {label} schema has case-colliding "
                    f"columns {seen[k]!r} and {f.name!r} — comparison "
                    "would silently drop one; resolve the collision first"
                )
            seen[k] = f.name
    omap = {f.name.lower(): f for f in o.fields}
    nmap = {f.name.lower(): f for f in n.fields}
    added = [
        (nmap[k].name, nmap[k].dataType.simpleString())
        for k in sorted(nmap.keys() - omap.keys())
    ]
    removed = [
        (omap[k].name, omap[k].dataType.simpleString())
        for k in sorted(omap.keys() - nmap.keys())
    ]
    retyped = [
        (
            nmap[k].name,
            omap[k].dataType.simpleString(),
            nmap[k].dataType.simpleString(),
        )
        for k in sorted(omap.keys() & nmap.keys())
        if omap[k].dataType != nmap[k].dataType
    ]
    return {"added": added, "removed": removed, "retyped": retyped}
