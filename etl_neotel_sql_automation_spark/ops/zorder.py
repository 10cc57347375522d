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
