"""Round-7 wave-39 workloads: model selection as a query, and the
k-anonymity generalization ladder —

- timeseries_ses_sweep — simple-exponential-smoothing alpha selection:
  the SAME day-count series folded under dyadic alphas 1/2, 1/4, 1/8
  (one fold each, all three as scalar expressions over one collected
  support), reporting per-alpha final level, one-step MAE, and the
  is_best flag (min SAE, larger-alpha tiebreak). The grid-search
  pattern every smoothing deployment runs before pinning a knob —
  holt/HW fixed their alphas by convention; this query shows the
  selection step itself is one pass, not |grid| passes over the data.
- privacy_generalization_ladder — the k-anonymity tuning table: for
  four generalization levels of the (custkey, orderdate) quasi-
  identifier pair (exact/day -> 10s/month -> 100s/quarter ->
  1000s/year), the group count, the minimum k, the share of rows in
  groups below k=5 (the rows a k-5 release must suppress), and the
  average group size. privacy_k_anonymity audits ONE cut; the ladder
  is how the cut is chosen — generalize until suppressed_ppm is
  acceptable.

Determinism: dyadic SES divisors (div truncation identical on
negatives — the holt_linear verification); ladder ratios are floor
ppm/milli on non-negative counts; date coarsening via date_trunc
month/quarter/year (identical semantics both engines).

Scale notes: the sweep is one day aggregate + three date-domain-
bounded folds; the ladder is four keyed aggregates unioned (each
map-side combinable) over coarsened keys. Zero joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

_SES_S = 1_000_000
_ALPHAS = (2, 4, 8)  # dyadic denominators: alpha = 1/d

# ---------------------------------------------------------------------------
# timeseries_ses_sweep
# ---------------------------------------------------------------------------


def _ses_fold(denom: int) -> str:
    """One SES fold: state (l, sae); err measured before the update."""
    return f"""
        aggregate(
          slice(seq, 2, greatest(cast(size(seq) as int) - 1, 0)),
          named_struct('l', seq[0].y * CAST({_SES_S} AS BIGINT),
                       'sae', CAST(0 AS BIGINT)),
          (acc, e) -> named_struct(
            'l', acc.l + (e.y * {_SES_S} - acc.l) div {denom},
            'sae', acc.sae + abs(e.y * {_SES_S} - acc.l))
        )"""


def ses_sweep_frame(orders: DataFrame) -> DataFrame:
    """Frame core of timeseries_ses_sweep (scaling-probe entry)."""
    daily = (
        orders.select(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("seq"),
        F.count("*").cast("bigint").alias("n_days"),
    ).filter(F.col("n_days") > 0)
    folds = series.select(
        "n_days",
        *[
            F.expr(_ses_fold(d)).alias(f"st{d}")
            for d in _ALPHAS
        ],
    )
    stack = ", ".join(
        f"{1000 // d}L, st{d}.l, st{d}.sae" for d in _ALPHAS
    )
    rows = folds.selectExpr(
        "n_days",
        f"stack({len(_ALPHAS)}, {stack}) AS (alpha_milli, level_micro, sae)",
    )
    return rows.select(
        "alpha_milli",
        "level_micro",
        F.expr("CAST(sae div greatest(n_days - 1, 1) AS BIGINT)").alias(
            "mae_micro"
        ),
        F.expr(
            "CAST(CASE WHEN row_number() OVER (ORDER BY sae,"
            " alpha_milli DESC) = 1 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("is_best"),
    ).orderBy(F.desc("alpha_milli"))


def _ses_oracle() -> str:
    # one recursive CTE carrying all three alphas as column pairs
    lcols = ", ".join(f"l{d}, sae{d}" for d in _ALPHAS)
    seeds = ", ".join(
        f"y * {_SES_S}, CAST(0 AS BIGINT)" for _ in _ALPHAS
    )
    upds = ",\n               ".join(
        f"rec.l{d} + (seq.y * {_SES_S} - rec.l{d}) // {d},"
        f" rec.sae{d} + abs(seq.y * {_SES_S} - rec.l{d})"
        for d in _ALPHAS
    )
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({1000 // d} AS BIGINT) AS alpha_milli,"
        f" l{d} AS level_micro, sae{d} AS sae FROM r"
        for d in _ALPHAS
    )
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
      WITH RECURSIVE rec(i, {lcols}) AS (
        SELECT CAST(1 AS BIGINT), {seeds} FROM seq WHERE i = 1
        UNION ALL
        SELECT rec.i + 1,
               {upds}
        FROM rec JOIN seq ON seq.i = rec.i + 1
      )
      SELECT * FROM rec ORDER BY i DESC LIMIT 1
    ),
    rows_ AS (
      {unions}
    )
    SELECT alpha_milli, level_micro,
           CAST(sae // greatest((SELECT n_days FROM n) - 1, 1) AS BIGINT)
             AS mae_micro,
           CAST(CASE WHEN row_number() OVER (ORDER BY sae,
                                             alpha_milli DESC) = 1
                THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM rows_ ORDER BY alpha_milli DESC
    """


@query("timeseries_ses_sweep", oracle=_ses_oracle())
def timeseries_ses_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SES alpha grid search in one pass: per dyadic alpha (1/2, 1/4,
    1/8) the final level, one-step MAE, and the min-SAE winner."""
    return ses_sweep_frame(table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# privacy_generalization_ladder
# ---------------------------------------------------------------------------

_LEVELS = (
    (0, "o_custkey", "date_trunc('day', o_orderdate)"),
    (1, "o_custkey div 10", "date_trunc('month', o_orderdate)"),
    (2, "o_custkey div 100", "date_trunc('quarter', o_orderdate)"),
    (3, "o_custkey div 1000", "date_trunc('year', o_orderdate)"),
)


def generalization_ladder_frame(orders: DataFrame) -> DataFrame:
    """Frame core of privacy_generalization_ladder (scaling-probe
    entry)."""
    outs = []
    for lvl, ck, dt in _LEVELS:
        g = (
            orders.selectExpr(
                f"CAST({ck} AS BIGINT) AS qi_key", f"{dt} AS qi_date"
            )
            .groupBy("qi_key", "qi_date")
            .agg(F.count("*").cast("bigint").alias("k"))
        )
        outs.append(
            g.agg(
                F.lit(lvl).cast("bigint").alias("level"),
                F.count("*").cast("bigint").alias("n_groups"),
                F.min("k").cast("bigint").alias("min_k"),
                F.expr(
                    "CAST((1000000 * sum(CASE WHEN k < 5 THEN k ELSE 0 END))"
                    " div sum(k) AS BIGINT)"
                ).alias("suppressed_ppm"),
                F.expr(
                    "CAST((1000 * sum(k)) div count(*) AS BIGINT)"
                ).alias("avg_group_milli"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("level")


def _ladder_oracle() -> str:
    parts = []
    for lvl, ck, dt in _LEVELS:
        ck_d = ck.replace(" div ", " // ")
        parts.append(f"""
      SELECT CAST({lvl} AS BIGINT) AS level,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST((1000000 * sum(CASE WHEN k < 5 THEN k ELSE 0 END))
                  // sum(k) AS BIGINT) AS suppressed_ppm,
             CAST((1000 * sum(k)) // count(*) AS BIGINT) AS avg_group_milli
      FROM (
        SELECT CAST({ck_d} AS BIGINT) AS qi_key, {dt} AS qi_date,
               CAST(count(*) AS BIGINT) AS k
        FROM orders GROUP BY 1, 2
      )""")
    body = "\n      UNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{body}\n    ) ORDER BY level"


@query("privacy_generalization_ladder", oracle=_ladder_oracle())
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization ladder over (custkey, orderdate):
    per level the group count, min k, rows-to-suppress share for a
    k=5 release, and average group size."""
    return generalization_ladder_frame(table(spark, sf_dir, "orders"))
