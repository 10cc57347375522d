"""Native aggregate surfaces with exact cross-engine semantics:
bitmap-based distinct counting (exact AND mergeable — the structure
that replaces HLL when you need exactness), regression aggregates
re-derived from exact integer/decimal moments (with the native
``regr_*`` family checked against them as a derived property), and
the ``try_*`` overflow-safe arithmetic surface ANSI mode makes
mandatory.

House determinism rules apply (see workload/__init__): bitmaps are
exact so values compare directly; regression moments ride the cent
grid in DECIMAL(38,0) (Syy in cents² overflows BIGINT at sf0.1 —
decimal sums stay exact on both engines); the only floats are single
IEEE expressions over exact operands, rounded identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table


@query(
    "agg_bitmap_users",
    oracle="""
    WITH per AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_users FROM per
    UNION ALL
    SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    ORDER BY event_type
    """,
)
def agg_bitmap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via Spark's bitmap aggregates
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg
    / bitmap_or_agg / bitmap_count): per-event-type distinct users
    from per-(type, bucket) bitmaps, PLUS a global row whose count
    comes from OR-merging the per-type bitmaps — never from
    re-scanning events. The mergeable-sketch shape of agg_hll_mergeable
    with exactness instead of a 5%% error bar: daily/partition bitmap
    tables OR together in milliseconds, and unlike HLL the merged
    count is still exact — the right structure when distinct counts
    feed billing or dedup accounting rather than dashboards.

    Scale shape: state per group is one 4 KB bitmap per 32768-id
    bucket; the shuffle carries bitmaps, not ids. Values are exact,
    so the oracle compares counts directly — no derived property
    needed.
    """
    ev = table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    per = per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users")
    )
    merged = (
        per_bucket.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm_all"))
        .agg(F.sum(F.expr("bitmap_count(bm_all)")).cast("long").alias("n_users"))
        .select(F.lit("ALL").alias("event_type"), "n_users")
    )
    return per.unionAll(merged).orderBy("event_type")


# Exact-moment regression on the cent grid: x = quantity (integer-
# valued), y = extended price in cents. Slope/intercept/r2 are single
# IEEE expressions over the decimal moments, written identically on
# both engines.
_REGR_SLOPE = (
    "round((n * sxy - sx * sy) * 1.0e0 / (n * sxx - sx * sx), 6)"
)
_REGR_INTERCEPT = (
    "round((sy * 1.0e0 - ((n * sxy - sx * sy) * 1.0e0 / (n * sxx - sx * sx)) * sx)"
    " / n, 6)"
)
_REGR_R2 = (
    "round(((n * sxy - sx * sy) * 1.0e0 * (n * sxy - sx * sy))"
    " / ((n * sxx - sx * sx) * 1.0e0 * (n * syy - sy * sy)), 6)"
)

_REGR_MOMENTS_SQL = """
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))
                      * CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))
                      * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))
                      * CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
      FROM lineitem GROUP BY l_returnflag
"""


@query(
    "agg_regr_moments",
    oracle=f"""
    WITH m AS ({_REGR_MOMENTS_SQL})
    SELECT l_returnflag, n,
           {_REGR_SLOPE} AS slope_cents,
           {_REGR_INTERCEPT} AS intercept_cents,
           {_REGR_R2} AS r2,
           TRUE AS native_agrees
    FROM m ORDER BY l_returnflag
    """,
)
def agg_regr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear regression of extended price (cents) on quantity per
    return flag, from EXACT moments: the five sums ride the cent grid
    as DECIMAL(38,0) (Syy in cents² overflows BIGINT at sf0.1;
    decimal sums are exact and order-free on both engines), and
    slope/intercept/r² are single identically-written IEEE
    expressions — the deterministic re-derivation of SQL's
    ``regr_slope``/``regr_intercept``/``regr_r2``, whose native
    double-summing implementations cannot be hash-compared across
    engines (the same reason agg_corr_price_qty uses exact moments).

    The native family is still exercised: ``native_agrees`` is TRUE
    iff Spark's own regr_slope agrees with the exact-moment slope to
    1e-6 relative — the derived-property pattern from the sketch
    queries, here guarding against moment-derivation bugs.

    Scale shape: one combinable aggregate to |return flags| rows;
    everything else is scalar arithmetic on a dimension-sized frame.
    """
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    moments = spark.sql(_REGR_MOMENTS_SQL)
    native = li.groupBy("l_returnflag").agg(
        F.expr("regr_slope(l_extendedprice * 100, l_quantity)").alias("nslope")
    )
    out = moments.join(native, "l_returnflag").selectExpr(
        "l_returnflag",
        "n",
        f"{_REGR_SLOPE} AS slope_cents",
        f"{_REGR_INTERCEPT} AS intercept_cents",
        f"{_REGR_R2} AS r2",
        f"abs(nslope - (n * sxy - sx * sy) * 1.0e0 / (n * sxx - sx * sx))"
        f" <= 1.0e-6 * (1.0e0 + abs((n * sxy - sx * sy) * 1.0e0 / (n * sxx - sx * sx)))"
        " AS native_agrees",
    )
    return out.orderBy("l_returnflag")


@query(
    "scalar_try_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderkey + 1                  AS ok_add,
           CAST(NULL AS BIGINT)            AS overflow_mul,
           CAST(NULL AS DOUBLE)            AS div_zero,
           round(o_orderkey / 4.0e0, 6)    AS div_ok,
           CAST(NULL AS VARCHAR)           AS elem_oob,
           CAST(NULL AS BIGINT)            AS sum_overflow
    FROM orders WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_*`` overflow/error-safe arithmetic surface — the
    family ANSI mode (the Spark 4 default, and this engine's session
    default) makes mandatory wherever inputs can overflow or divide
    by zero: try_add, try_multiply (multiplier >= 2 forces BIGINT overflow -> NULL),
    try_divide (zero -> NULL), try_element_at (out-of-bounds -> NULL),
    and a try_sum whose group genuinely overflows BIGINT. The oracle
    states the expected scalars directly (DuckDB has no try_ family —
    the VALUES are the contract, the same pattern as
    scalar_map_funcs). Under plain ANSI operators every one of these
    rows would throw; under try_* they degrade to NULL row-locally —
    exactly the salvage-don't-abort policy the conform layer
    (functions.py) applies to dirty ETL input.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    big = F.lit(9223372036854775807).cast("long")
    per_row = o.select(
        "o_orderkey",
        F.expr("try_add(o_orderkey, 1)").alias("ok_add"),
        F.expr("try_multiply(o_orderkey + 2, 9223372036854775807L)").alias(
            "overflow_mul"
        ),
        F.expr("try_divide(o_orderkey, 0)").alias("div_zero"),
        F.expr("round(try_divide(o_orderkey, 4), 6)").alias("div_ok"),
        F.expr("try_element_at(array('a', 'b'), 5)").alias("elem_oob"),
    )
    # try_sum: a group whose BIGINT sum overflows must yield NULL, not
    # throw — two max-BIGINT rows per order key via explode.
    ovf = (
        o.select("o_orderkey", F.explode(F.array(big, big)).alias("v"))
        .groupBy("o_orderkey")
        .agg(F.expr("try_sum(v)").alias("sum_overflow"))
    )
    return per_row.join(ovf, "o_orderkey").orderBy("o_orderkey")
