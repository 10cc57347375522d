"""Round-6 wave-18 workloads: referential integrity, embedding
geometry, and sequential forecasting — the full-star orphan-key audit
(every foreign-key edge of the schema in ONE report: the DQ readout a
warehouse runs nightly), an embedding anisotropy meter (common-
direction mass + participation-ratio effective dimensionality — the
numbers that say whether cosine similarity is even meaningful before
ABTT-style postprocessing), and Holt's linear-trend smoothing as an
exact integer recurrence folded over the bounded day support — the
sequential-recurrence pattern the registry didn't yet demonstrate
(PageRank unrolls ITERATIONS; this folds a SEQUENCE).

Determinism rules (house style): orphan shares in integer ppm;
embedding components quantize to centi units (the PCA precedent) with
corpus-sized sums exact in BIGINT/DECIMAL(38,0)/HUGEINT; the Holt
recurrence uses dyadic smoothing (alpha = 1/2, beta = 1/4) so every
step is one integer truncating division — Spark `div` and DuckDB `//`
truncate identically on BIGINT, including negatives (verified), so the
fold replays bit-for-bit in a recursive CTE.

Scale notes: the orphan audit is seven key-partitioned anti-joins
(dim-sized parents broadcast by AQE); anisotropy is one combinable
per-dim aggregate (64 rows); Holt folds over the DAY support
(a few thousand elements at any corpus size — the
orders_interarrival_quartiles bound), never the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# dq_referential_orphans — every FK edge of the star schema, one row
# each: child table/key, rows scanned, orphans (child keys with no
# parent), orphan ppm. Anti-join counts; null child keys count as
# orphans (a null FK is unreconstructable lineage either way).
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem.l_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _orphan_oracle() -> str:
    legs = []
    for edge, child, ck, parent, pk in _FK_EDGES:
        legs.append(f"""
    SELECT '{edge}' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphan,
           CAST((1000000 * sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS orphan_ppm
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{ck} = p.{pk}""")
        # parents are deduped on both sides so a (dirty) duplicated
        # parent key can never inflate the child row count
    return "\nUNION ALL\n".join(legs) + "\nORDER BY fk_edge"


@query("dq_referential_orphans", oracle=_orphan_oracle())
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-key audit over all seven FK edges of the star schema:
    per-edge child rows, orphan count, orphan ppm."""
    tables = {
        name: table(spark, sf_dir, name)
        for name in (
            "lineitem", "orders", "part", "supplier", "customer",
            "nation", "region",
        )
    }
    return referential_orphans_frame(tables)


def referential_orphans_frame(tables: dict[str, DataFrame]) -> DataFrame:
    """Frame core of dq_referential_orphans (scaling-probe entry)."""
    legs = []
    for edge, child, ck, parent, pk in _FK_EDGES:
        c = tables[child].select(F.col(ck).alias("ck"))
        p = tables[parent].select(F.col(pk).alias("pk")).distinct()
        legs.append(
            c.join(p, c.ck == p.pk, "left").agg(
                F.lit(edge).alias("fk_edge"),
                F.count("*").cast("bigint").alias("n_child"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphan"),
                F.expr(
                    "CAST((1000000 * sum(CASE WHEN pk IS NULL THEN 1 ELSE 0"
                    " END)) div count(*) AS BIGINT)"
                ).alias("orphan_ppm"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("fk_edge")


# ---------------------------------------------------------------------------
# emb_anisotropy_ratio — is this embedding space isotropic enough for
# cosine to mean anything? Three exact readouts off ONE centi-quantized
# per-dim aggregate:
#   mean_mass_ppm      = ||mean vector||^2 / E[||x||^2]  (common-
#                        direction mass — what ABTT removes first)
#   top_dim_var_ppm    = max single-dim variance share of total
#   effective_dims_milli = participation ratio (sum var)^2 / sum var^2
#                        (the effective rank; 64000 = perfectly flat)
# All corpus-sized sums are exact BIGINTs; the ratio arithmetic runs in
# DECIMAL(38,0)/HUGEINT floor divisions (non-negative throughout).
# Variance scaled by n^2: var_d = n*sum(x^2) - sum(x)^2, exact. The
# participation ratio normalizes each dim's variance to ppb of total
# FIRST (scale-free, so it cannot degenerate at small variance the way
# a fixed down-scale would), then (sum shares)^2 / (sum shares^2) over
# the 64-row frame; nullif guards the all-constant corpus on both
# engines (Spark div-by-zero nulls where DuckDB errors).
# ---------------------------------------------------------------------------


@query(
    "emb_anisotropy_ratio",
    oracle="""
    WITH x AS (
      SELECT vec_id, dim,
             CAST(round(v[dim] * 100.0e0) AS BIGINT) AS x_c
      FROM (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               unnest(range(1, len(embedding) + 1)) AS dim
        FROM embeddings
      )
    ),
    d AS (
      SELECT dim, CAST(sum(x_c) AS BIGINT) AS s,
             CAST(sum(x_c * x_c) AS BIGINT) AS s2,
             CAST(count(*) AS BIGINT) AS n
      FROM x GROUP BY dim
    ),
    v AS (
      SELECT dim, n, s, s2,
             CAST(n AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s AS var_n2
      FROM d
    ),
    t AS (
      SELECT CAST(max(n) AS BIGINT) AS n_vecs,
             CAST(count(*) AS BIGINT) AS n_dims,
             CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS mean_mass_n2,
             CAST(sum(CAST(s2 AS HUGEINT)) AS HUGEINT) AS energy,
             CAST(sum(var_n2) AS HUGEINT) AS tot_var,
             CAST(max(var_n2) AS HUGEINT) AS max_var
      FROM v
    ),
    sh AS (
      SELECT CAST(sum((1000000000 * var_n2) // nullif(t.tot_var, 0))
                  AS HUGEINT) AS sum_share,
             CAST(sum(((1000000000 * var_n2) // nullif(t.tot_var, 0))
                      * ((1000000000 * var_n2) // nullif(t.tot_var, 0)))
                  AS HUGEINT) AS sum_share2
      FROM v CROSS JOIN t
    )
    SELECT n_vecs, n_dims,
           CAST((1000000 * mean_mass_n2)
                // nullif(CAST(n_vecs AS HUGEINT) * energy, 0)
                AS BIGINT) AS mean_mass_ppm,
           CAST((1000000 * max_var) // nullif(tot_var, 0) AS BIGINT)
             AS top_dim_var_ppm,
           CAST((1000 * sum_share * sum_share) // nullif(sum_share2, 0)
                AS BIGINT) AS effective_dims_milli
    FROM t CROSS JOIN sh
    """,
)
def emb_anisotropy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy meter: common-direction mass (ppm), top
    single-dim variance share (ppm), and participation-ratio effective
    dimensionality (milli-dims) — exact integer arithmetic off one
    per-dim aggregate."""
    return anisotropy_frame(table(spark, sf_dir, "embeddings"))


def anisotropy_frame(emb: DataFrame) -> DataFrame:
    """Frame core of emb_anisotropy_ratio (scaling-probe entry)."""
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "val"
        ),
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.expr("CAST(round(val * 100.0e0) AS BIGINT)").alias("x_c"),
    )
    d = x.groupBy("dim").agg(
        F.sum("x_c").cast("bigint").alias("s"),
        F.sum(F.col("x_c") * F.col("x_c")).cast("bigint").alias("s2"),
        F.count("*").cast("bigint").alias("n"),
    )
    dec = "DECIMAL(38,0)"
    v = d.select(
        "n",
        "s",
        "s2",
        F.expr(f"CAST(n AS {dec}) * s2 - CAST(s AS {dec}) * s").alias(
            "var_n2"
        ),
    )
    t = v.agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.count("*").cast("bigint").alias("n_dims"),
        F.sum(F.expr(f"CAST(s AS {dec}) * s")).cast(dec).alias("mean_mass_n2"),
        F.sum(F.expr(f"CAST(s2 AS {dec})")).cast(dec).alias("energy"),
        F.sum("var_n2").cast(dec).alias("tot_var"),
        F.max("var_n2").cast(dec).alias("max_var"),
    )
    # per-dim variance share in ppb (exact BIGINT, <= 1e9), then the
    # participation ratio over the 64-row frame — shares re-enter
    # DECIMAL for the square so the sums never touch int64 limits
    sh = (
        v.crossJoin(F.broadcast(t))  # 1-row totals over the dim frame
        .select(
            F.expr(
                "CAST((1000000000 * var_n2) div nullif(tot_var, 0)"
                f" AS {dec})"
            ).alias("share")
        )
        .agg(
            F.sum("share").cast(dec).alias("sum_share"),
            F.sum(F.expr("share * share")).cast(dec).alias("sum_share2"),
        )
    )
    return t.crossJoin(F.broadcast(sh)).select(  # two 1-row aggregates
        "n_vecs",
        "n_dims",
        F.expr(
            f"CAST((1000000 * mean_mass_n2)"
            f" div nullif(CAST(n_vecs AS {dec}) * energy, 0) AS BIGINT)"
        ).alias("mean_mass_ppm"),
        F.expr(
            "CAST((1000000 * max_var) div nullif(tot_var, 0) AS BIGINT)"
        ).alias("top_dim_var_ppm"),
        F.expr(
            "CAST((1000 * sum_share * sum_share) div nullif(sum_share2, 0)"
            " AS BIGINT)"
        ).alias("effective_dims_milli"),
    )


# ---------------------------------------------------------------------------
# timeseries_holt_linear — Holt's double exponential smoothing over the
# daily order-count series, as an EXACT integer recurrence (micro-unit
# counts, dyadic alpha = 1/2, beta = 1/4):
#   l_t = (y_t*S + l + b) div 2
#   b_t = b + (l_t - l - b) div 4
#   sae += |y_t*S - (l + b)|       (one-step-ahead residuals)
# folded left-to-right over the sorted day support with F.aggregate —
# the day support is a few thousand elements at ANY corpus size, so
# the fold is a bounded scalar expression, not a row-count recursion.
# DuckDB replays the identical recurrence as a recursive CTE. Both
# `div`s truncate toward zero identically on negatives.
# ---------------------------------------------------------------------------

_HOLT_S = 1_000_000


def _holt_oracle() -> str:
    return f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT row_number() OVER (ORDER BY day) AS i, y FROM daily
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM seq),
    r AS (
      WITH RECURSIVE rec(i, l, b, sae) AS (
        SELECT CAST(1 AS BIGINT), y * {_HOLT_S}, CAST(0 AS BIGINT),
               CAST(0 AS BIGINT)
        FROM seq WHERE i = 1
        UNION ALL
        SELECT rec.i + 1,
               (seq.y * {_HOLT_S} + rec.l + rec.b) // 2,
               rec.b + ((seq.y * {_HOLT_S} + rec.l + rec.b) // 2
                        - rec.l - rec.b) // 4,
               rec.sae + abs(seq.y * {_HOLT_S} - (rec.l + rec.b))
        FROM rec JOIN seq ON seq.i = rec.i + 1
      )
      SELECT l, b, sae FROM rec ORDER BY i DESC LIMIT 1
    )
    SELECT n.n_days,
           r.l AS level_micro,
           r.b AS trend_micro,
           CAST(r.l + 30 * r.b AS BIGINT) AS forecast30_micro,
           CAST(r.sae // greatest(n.n_days - 1, 1) AS BIGINT)
             AS mae_micro
    FROM n CROSS JOIN r
    """


@query("timeseries_holt_linear", oracle=_holt_oracle())
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of the daily order-count series
    (exact dyadic integer recurrence): final level/trend, the 30-day-
    ahead forecast, and mean absolute one-step error, all in
    micro-counts."""
    return holt_linear_frame(table(spark, sf_dir, "orders"))


def holt_linear_frame(orders: DataFrame) -> DataFrame:
    """Frame core of timeseries_holt_linear (scaling-probe entry)."""
    daily = (
        orders.select(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    # one row: the sorted day series (bounded by the date domain)
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("seq"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    folded = series.select(
        "n_days",
        F.expr(
            f"""
            aggregate(
              slice(seq, 2, greatest(cast(size(seq) as int) - 1, 0)),
              named_struct(
                'l', seq[0].y * CAST({_HOLT_S} AS BIGINT),
                'b', CAST(0 AS BIGINT),
                'sae', CAST(0 AS BIGINT)),
              (acc, e) -> named_struct(
                'l', (e.y * {_HOLT_S} + acc.l + acc.b) div 2,
                'b', acc.b + ((e.y * {_HOLT_S} + acc.l + acc.b) div 2
                              - acc.l - acc.b) div 4,
                'sae', acc.sae + abs(e.y * {_HOLT_S} - (acc.l + acc.b)))
            )
            """
        ).alias("st"),
    )
    # an empty series yields one degenerate row from the ungrouped agg
    # (n_days=0); the oracle's recursive CTE seeds no row — drop it so
    # both engines return zero rows for an empty input
    return folded.filter(F.col("n_days") > 0).select(
        "n_days",
        F.col("st.l").alias("level_micro"),
        F.col("st.b").alias("trend_micro"),
        (F.col("st.l") + 30 * F.col("st.b")).cast("bigint").alias(
            "forecast30_micro"
        ),
        F.expr("st.sae div greatest(n_days - 1, 1)").cast("bigint").alias(
            "mae_micro"
        ),
    )
