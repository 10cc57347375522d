"""Round-7 wave-36 workload: Hilbert-curve layout beside the Morton
meter — io_zorder_layout measures what z-order buys over a linear
sort; io_hilbert_layout adds the third contender. The Hilbert code is
the locality upgrade over Morton (consecutive indices are ALWAYS grid
neighbors; Morton jumps the quadrant seam every 2^k rows), so files
cut from a Hilbert order have tighter min/max envelopes and
footer-stats pruning skips more of them — the reason Delta/Iceberg
grew Hilbert clustering after shipping z-order. Same box predicate,
same rows-per-file, same envelope-intersection metric as
io_zorder_layout, so the three scan_ppm rows are directly comparable.

Determinism: the Hilbert walk is pure integer bit arithmetic
(ops.zorder.py_hilbert_value is the reference; Spark folds the level
sequence in ONE aggregate() expression, DuckDB runs generated chained
CTE stages — both bit-exact vs the reference on the full 4-bit grid
in tests). File ids come from a row_number over (code, o_orderkey) —
fully tiebroken.

Scale notes: identical to io_zorder_layout — the meter is a layout
simulation whose global row_number stands in for the writer's total
order; the deployed write is repartitionByRange + local sort by the
code. That shape is REGISTERED here (r8) as io_hilbert_layout_deployed:
top-bits range buckets + bucket-local row_number, so no single-task
total sort survives anywhere in the plan (the r7 VERDICT item; the
simulation's 100x probe was linear in the global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import query, table
from ..ops.zorder import hilbert_expr, sql_hilbert_stages, sql_z_value, z_value
from .wave12 import _Z_BOX, _Z_EPOCH, _Z_ROWS_PER_FILE


def hilbert_layout_frame(orders: DataFrame) -> DataFrame:
    """Frame core of io_hilbert_layout (scaling-probe entry)."""
    xlo, xhi, ylo, yhi = _Z_BOX
    base = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH)).alias("y"),
    ).withColumn("zv", z_value("x", "y", 16)).withColumn(
        "hv", F.expr(hilbert_expr("x", "y", 16))
    )

    def layout(name: str, *order_cols) -> DataFrame:
        rn = F.row_number().over(W.orderBy(*order_cols))
        return base.select(
            F.lit(name).alias("layout"), "x", "y", rn.alias("rn")
        ).select(
            "layout",
            "x",
            "y",
            F.expr(f"CAST((rn - 1) div {_Z_ROWS_PER_FILE} AS BIGINT)").alias(
                "file_id"
            ),
        )

    both = (
        layout("linear_custkey", "x", "o_orderkey")
        .unionAll(layout("zorder", "zv", "o_orderkey"))
        .unionAll(layout("hilbert", "hv", "o_orderkey"))
    )
    in_box = F.col("x").between(xlo, xhi) & F.col("y").between(ylo, yhi)
    files = both.groupBy("layout", "file_id").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.sum(F.when(in_box, 1).otherwise(0)).cast("bigint").alias("matched"),
    )
    hit = (
        (F.col("min_x") <= xhi)
        & (F.col("max_x") >= xlo)
        & (F.col("min_y") <= yhi)
        & (F.col("max_y") >= ylo)
    )
    return (
        files.groupBy("layout")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("bigint")
            .alias("files_scanned"),
            F.sum("matched").cast("bigint").alias("rows_matched"),
        )
        .select(
            "layout",
            "n_files",
            "files_scanned",
            "rows_matched",
            F.expr(
                "CAST((1000000 * files_scanned) div n_files AS BIGINT)"
            ).alias("scan_ppm"),
        )
        .orderBy("layout")
    )


def _hilbert_oracle() -> str:
    xlo, xhi, ylo, yhi = _Z_BOX
    stages = sql_hilbert_stages("base", "o_orderkey, x, y", "x", "y", 16)
    return f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey AS x,
             datediff('day', TIMESTAMP '{_Z_EPOCH} 00:00:00', o_orderdate)
               AS y
      FROM orders
    ),
    {stages},
    z AS (
      SELECT base.o_orderkey, base.x, base.y,
             {sql_z_value("base.x", "base.y", 16)} AS zv,
             h16.hd AS hv
      FROM base JOIN h16 ON base.o_orderkey = h16.o_orderkey
    ),
    lay AS (
      SELECT 'linear_custkey' AS layout, x, y,
             (row_number() OVER (ORDER BY x, o_orderkey) - 1)
               // {_Z_ROWS_PER_FILE} AS file_id
      FROM z
      UNION ALL
      SELECT 'zorder', x, y,
             (row_number() OVER (ORDER BY zv, o_orderkey) - 1)
               // {_Z_ROWS_PER_FILE}
      FROM z
      UNION ALL
      SELECT 'hilbert', x, y,
             (row_number() OVER (ORDER BY hv, o_orderkey) - 1)
               // {_Z_ROWS_PER_FILE}
      FROM z
    ),
    files AS (
      SELECT layout, file_id,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y,
             CAST(sum(CASE WHEN x BETWEEN {xlo} AND {xhi}
                            AND y BETWEEN {ylo} AND {yhi}
                           THEN 1 ELSE 0 END) AS BIGINT) AS matched
      FROM lay GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN min_x <= {xhi} AND max_x >= {xlo}
                          AND min_y <= {yhi} AND max_y >= {ylo}
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(sum(matched) AS BIGINT) AS rows_matched,
           CAST((1000000 * sum(CASE WHEN min_x <= {xhi} AND max_x >= {xlo}
                                     AND min_y <= {yhi} AND max_y >= {ylo}
                                    THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS scan_ppm
    FROM files GROUP BY layout ORDER BY layout
    """


@query("io_hilbert_layout", oracle=_hilbert_oracle())
def io_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Files scanned under footer-stats pruning for the io_zorder
    box predicate, three layouts side by side: linear sort, Morton
    (z-order), Hilbert — the measured locality ladder."""
    return hilbert_layout_frame(table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# io_hilbert_layout_deployed (r8) — the SCALE-SHAPE twin of the layout
# ladder: the simulation above stands in for the writer with a global
# row_number() (one total sort — a single task at 100 TB, the caveat
# the module docstring documents). The deployed write is
# repartitionByRange(code) + a per-partition local sort; this variant
# meters THAT shape deterministically: the range split is the code's
# top bits (a fixed-width range partitioning both engines compute
# identically — no sampled boundaries to disagree on), files are cut
# per bucket by a bucket-partitioned row_number, so every sort in the
# plan is bucket-local and the meter parallelizes across buckets
# instead of funneling through one task. Bucket tails leave the last
# file of each bucket ragged — exactly what the real writer produces —
# so n_files is >= the simulation's count; the envelope-intersection
# metric is unchanged and the three layout rows stay comparable.
# ---------------------------------------------------------------------------

_ZD_BITS = 5  # 2^5 = 32 range buckets
_ZD_CODE_DIV = 1 << (2 * 16 - _ZD_BITS)  # top bits of the 32-bit code
_ZD_X_DIV = 1 << (16 - _ZD_BITS)  # top bits of the 16-bit x domain


def hilbert_layout_deployed_frame(orders: DataFrame) -> DataFrame:
    """Frame core of io_hilbert_layout_deployed (scaling-probe entry)."""
    xlo, xhi, ylo, yhi = _Z_BOX
    base = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH)).alias("y"),
    ).withColumn("zv", z_value("x", "y", 16)).withColumn(
        "hv", F.expr(hilbert_expr("x", "y", 16))
    )

    def layout(name: str, bucket_sql: str, *order_cols) -> DataFrame:
        b = base.withColumn("bkt", F.expr(f"CAST({bucket_sql} AS BIGINT)"))
        rn = F.row_number().over(
            W.partitionBy("bkt").orderBy(*order_cols)
        )
        return b.select(
            F.lit(name).alias("layout"), "x", "y", "bkt", rn.alias("rn")
        ).select(
            "layout",
            "x",
            "y",
            F.expr(
                f"CAST(bkt * 1000000 + (rn - 1) div {_Z_ROWS_PER_FILE}"
                " AS BIGINT)"
            ).alias("file_id"),
        )

    both = (
        layout("linear_custkey", f"x div {_ZD_X_DIV}", "x", "o_orderkey")
        .unionAll(layout("zorder", f"zv div {_ZD_CODE_DIV}", "zv", "o_orderkey"))
        .unionAll(
            layout("hilbert", f"hv div {_ZD_CODE_DIV}", "hv", "o_orderkey")
        )
    )
    in_box = F.col("x").between(xlo, xhi) & F.col("y").between(ylo, yhi)
    files = both.groupBy("layout", "file_id").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.sum(F.when(in_box, 1).otherwise(0)).cast("bigint").alias("matched"),
    )
    hit = (
        (F.col("min_x") <= xhi)
        & (F.col("max_x") >= xlo)
        & (F.col("min_y") <= yhi)
        & (F.col("max_y") >= ylo)
    )
    return (
        files.groupBy("layout")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("bigint")
            .alias("files_scanned"),
            F.sum("matched").cast("bigint").alias("rows_matched"),
        )
        .select(
            "layout",
            "n_files",
            "files_scanned",
            "rows_matched",
            F.expr(
                "CAST((1000000 * files_scanned) div n_files AS BIGINT)"
            ).alias("scan_ppm"),
        )
        .orderBy("layout")
    )


def _hilbert_deployed_oracle() -> str:
    xlo, xhi, ylo, yhi = _Z_BOX
    stages = sql_hilbert_stages("base", "o_orderkey, x, y", "x", "y", 16)
    lays = "\n      UNION ALL ".join(
        f"""SELECT '{name}' AS layout, x, y,
             ({order_col} // {div}) * 1000000
             + (row_number() OVER (
                  PARTITION BY {order_col} // {div}
                  ORDER BY {order_col}, o_orderkey) - 1)
               // {_Z_ROWS_PER_FILE} AS file_id
      FROM z"""
        for name, order_col, div in (
            ("linear_custkey", "x", _ZD_X_DIV),
            ("zorder", "zv", _ZD_CODE_DIV),
            ("hilbert", "hv", _ZD_CODE_DIV),
        )
    )
    return f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey AS x,
             datediff('day', TIMESTAMP '{_Z_EPOCH} 00:00:00', o_orderdate)
               AS y
      FROM orders
    ),
    {stages},
    z AS (
      SELECT base.o_orderkey, base.x, base.y,
             {sql_z_value("base.x", "base.y", 16)} AS zv,
             h16.hd AS hv
      FROM base JOIN h16 ON base.o_orderkey = h16.o_orderkey
    ),
    lay AS (
      {lays}
    ),
    files AS (
      SELECT layout, file_id,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y,
             CAST(sum(CASE WHEN x BETWEEN {xlo} AND {xhi}
                            AND y BETWEEN {ylo} AND {yhi}
                           THEN 1 ELSE 0 END) AS BIGINT) AS matched
      FROM lay GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN min_x <= {xhi} AND max_x >= {xlo}
                          AND min_y <= {yhi} AND max_y >= {ylo}
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(sum(matched) AS BIGINT) AS rows_matched,
           CAST((1000000 * sum(CASE WHEN min_x <= {xhi} AND max_x >= {xlo}
                                     AND min_y <= {yhi} AND max_y >= {ylo}
                                    THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS scan_ppm
    FROM files GROUP BY layout ORDER BY layout
    """


@query("io_hilbert_layout_deployed", oracle=_hilbert_deployed_oracle())
def io_hilbert_layout_deployed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployed-write layout ladder: files cut from a top-bits
    range partition + bucket-local sort (the repartitionByRange shape)
    instead of the simulation's single global sort — same box
    predicate, same envelope-intersection pruning metric."""
    return hilbert_layout_deployed_frame(table(spark, sf_dir, "orders"))
