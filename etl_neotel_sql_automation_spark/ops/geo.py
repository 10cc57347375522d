"""Geospatial operators: uniform-grid bucketed nearest neighbor.

The grid join is the standard distributed spatial pattern: bucket both
point sets into fixed cells, probe each point against its 3x3 cell
neighborhood via an equi-join on cell ids, and rank candidates by
exact distance. Cost per probe is 9x the average cell occupancy —
O(N * density), never O(N*M). Hot cells (skewed density) are the
salted-skew situation and take the same salt treatment.

THE DEPLOY KNOB: cell size must scale with target density —
``cell ~ sqrt(area / n_targets)`` keeps average cell occupancy
constant, so candidates stay O(points x occupancy). A FIXED cell over
a growing target set degenerates to O(points x targets): the scale
probe measured 0.8 s -> 20.1 s at 10x both sides under a fixed cell,
restored to linear under the scaled cell (SCALING.md). The same rule
as the LSH ``planes_per_table = log2(n) - 4`` knob.

Coordinates are integer micro-degrees and must be NON-NEGATIVE: Spark
``div`` truncates toward zero while DuckDB ``//`` floors, so the two
engines only agree on floor division for non-negative operands (the
same rule the bloom word packing follows for sign bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_nearest(
    points: DataFrame,
    targets: DataFrame,
    cell: int,
    point_id: str = "pid",
    target_id: str = "tid",
) -> DataFrame:
    """Nearest target per point within the 3x3 grid-cell neighborhood.

    ``points``/``targets`` carry (id, lat_u, lon_u) with non-negative
    integer micro-degree coordinates. Returns (point_id, target_id,
    dist2) with exact integer planar squared distance; ties broken by
    the smaller target id; points with an empty neighborhood drop out
    (grid semantics — widen ``cell`` for sparse target sets)."""
    cc = points.select(
        F.col(point_id),
        F.col("lat_u"),
        F.col("lon_u"),
        F.expr(f"lon_u div {cell}").alias("cx"),
        F.expr(f"lat_u div {cell}").alias("cy"),
    )
    sc = targets.select(
        F.col(target_id),
        F.col("lat_u").alias("t_lat"),
        F.col("lon_u").alias("t_lon"),
        F.expr(f"lon_u div {cell}").alias("tx"),
        F.expr(f"lat_u div {cell}").alias("ty"),
    )
    probes = cc.select(
        "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
    ).select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"))
    cand = probes.join(
        sc,
        (F.col("tx") == F.col("cx") + F.col("dx"))
        & (F.col("ty") == F.col("cy") + F.col("dy")),
    ).select(
        F.col(point_id),
        F.col(target_id),
        (
            (F.col("lat_u") - F.col("t_lat")) * (F.col("lat_u") - F.col("t_lat"))
            + (F.col("lon_u") - F.col("t_lon")) * (F.col("lon_u") - F.col("t_lon"))
        ).alias("dist2"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(point_id).orderBy("dist2", target_id)
    return (
        cand.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(F.col(point_id), F.col(target_id), F.col("dist2").cast("bigint").alias("dist2"))
    )
