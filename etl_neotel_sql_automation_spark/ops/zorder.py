"""Z-order (Morton) multi-dimensional clustering.

Sorting/range-partitioning data by the interleaved-bit Morton code of
two columns before writing keeps rows that are close in BOTH
dimensions inside the same files, so parquet min/max footer stats
prune scans filtered on either column — the data-layout lever for
multi-dimensional selective queries at 100 TB (the 1-D analog of what
``partitionBy`` does for a single column).

The code is a pure bit-arithmetic expression (shifts, masks, adds) —
whole-stage-codegen'd, no UDF, and reproducible in any engine with
64-bit integer ops, which is what makes it oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(c1: Column | str, c2: Column | str, bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of two
    non-negative integer columns (c1 -> even positions, c2 -> odd).
    2*bits <= 62 keeps the result in a positive bigint."""
    c1 = (F.col(c1) if isinstance(c1, str) else c1).cast("long")
    c2 = (F.col(c2) if isinstance(c2, str) else c2).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(c1, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(c2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def sql_z_value(e1: str, e2: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`z_value` over SQL expressions."""
    terms = []
    for i in range(bits):
        terms.append(f"((({e1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({e2} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def py_z_value(x: int, y: int, bits: int = 16) -> int:
    """Python reference implementation (tests/constant folding)."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def py_z_decode(z: int, bits: int = 16) -> tuple[int, int]:
    """Inverse of :func:`py_z_value` — proves the code is bijective."""
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


def cluster_by_z(
    df: DataFrame,
    col1: str,
    col2: str,
    n_partitions: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + sort by the Morton code: the write-side layout
    step. Files produced from the result have tight min/max envelopes
    on BOTH columns, so scans filtering on either prune at the footer
    level. (Range partitioning samples the z distribution, so skewed
    key spaces still balance.)"""
    zc = z_value(col1, col2, bits).alias("__z")
    return (
        df.withColumn("__z", zc)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


# --- Hilbert curve -----------------------------------------------------------
#
# The Hilbert code is the locality upgrade over Morton: consecutive
# Hilbert indices are ALWAYS grid neighbors (Morton jumps across the
# quadrant seam every 2^k rows), so fixed-size files cut from a
# Hilbert-sorted order have tighter min/max envelopes. The classic
# xy2d walk (Hamilton's / the Wikipedia reference form): per level s
# (high bit first), accumulate s^2 * ((3*rx) XOR ry) and rotate/flip
# the quadrant. Pure integer bit arithmetic, so it is exactly
# reproducible in any engine — Spark runs it as ONE aggregate() fold
# over the level sequence (a chained-projection form would blow up the
# plan tree: each level references x/y several times and project
# collapse multiplies the subtrees), DuckDB as generated chained CTE
# stages (tools can't fold; stages materialize columns, so cost stays
# linear in levels).


def py_hilbert_value(x: int, y: int, bits: int = 16) -> int:
    """Python reference implementation (tests/constant folding)."""
    n = 1 << bits
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_expr(e1: str, e2: str, bits: int = 16) -> str:
    """Spark SQL text of the Hilbert code of two non-negative integer
    expressions, as one aggregate() fold over the level sequence."""
    n1 = (1 << bits) - 1
    upd_x = (
        "CASE WHEN shiftright(acc.y, i) & 1 = 0 THEN"
        " CASE WHEN shiftright(acc.x, i) & 1 = 1"
        f" THEN {n1}L - acc.y ELSE acc.y END ELSE acc.x END"
    )
    upd_y = (
        "CASE WHEN shiftright(acc.y, i) & 1 = 0 THEN"
        " CASE WHEN shiftright(acc.x, i) & 1 = 1"
        f" THEN {n1}L - acc.x ELSE acc.x END ELSE acc.y END"
    )
    upd_d = (
        "acc.d + shiftleft(CAST((3 * (shiftright(acc.x, i) & 1))"
        " ^ (shiftright(acc.y, i) & 1) AS BIGINT), 2 * i)"
    )
    return (
        f"aggregate(sequence({bits - 1}, 0, -1),"
        f" named_struct('x', CAST({e1} AS BIGINT),"
        f" 'y', CAST({e2} AS BIGINT), 'd', CAST(0 AS BIGINT)),"
        f" (acc, i) -> named_struct('x', {upd_x}, 'y', {upd_y},"
        f" 'd', {upd_d}), acc -> acc.d)"
    )


def sql_hilbert_stages(
    base_cte: str, key_cols: str, e1: str, e2: str, bits: int = 16
) -> str:
    """DuckDB twin: generated chained CTE stages ``h0..h{bits}`` over
    ``base_cte`` (which must expose ``key_cols`` plus the two integer
    coordinates); the last stage exposes ``hd`` as the Hilbert code.
    Returns the CTE chain text to splice after the base CTE."""
    n1 = (1 << bits) - 1
    stages = [
        f"h0 AS (SELECT {key_cols}, CAST({e1} AS BIGINT) AS hx,"
        f" CAST({e2} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM {base_cte})"
    ]
    for k, i in enumerate(range(bits - 1, -1, -1)):
        upd_d = (
            f"hd + (CAST(xor(3 * ((hx >> {i}) & 1),"
            f" (hy >> {i}) & 1) AS BIGINT) << {2 * i})"
        )
        upd_x = (
            f"CASE WHEN (hy >> {i}) & 1 = 0 THEN"
            f" CASE WHEN (hx >> {i}) & 1 = 1"
            f" THEN {n1} - hy ELSE hy END ELSE hx END"
        )
        upd_y = (
            f"CASE WHEN (hy >> {i}) & 1 = 0 THEN"
            f" CASE WHEN (hx >> {i}) & 1 = 1"
            f" THEN {n1} - hx ELSE hx END ELSE hy END"
        )
        stages.append(
            f"h{k + 1} AS (SELECT {key_cols}, {upd_x} AS hx,"
            f" {upd_y} AS hy, {upd_d} AS hd FROM h{k})"
        )
    return ",\n    ".join(stages)
