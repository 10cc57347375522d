"""Round-6 wave-3c workloads: distributed 2-D skyline (Pareto
frontier) and grid-based density clustering (DBSCAN on cells).

Both demonstrate scale patterns the registry lacked: the skyline's
bucketed prefix-max decomposition (a global-order problem solved
without a global single-task window) and density clustering as
cell-aggregation + bounded-round component labeling (DBSCAN's
neighborhood scan turned into combinable counts — no pair joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from ..ops.hashing import md5_long, sql_md5_long

# ---------------------------------------------------------------------------
# skyline_suppliers — the Pareto frontier of suppliers on
# (account balance, total revenue): points no other supplier beats on
# both axes. The naive formulation is a quadratic dominance anti-join;
# the single-window formulation (sort by x desc, keep y above the
# running max) is O(n log n) but puts the WHOLE table through one
# global-order window task. The registered plan is the distributed
# decomposition: value-bucket x, within-bucket running max (per-bucket
# window — parallel), plus a cumulative max over the tiny bucket-stats
# frame joined back so higher buckets dominate lower ones without any
# global row order. Exact duplicates pre-aggregated so strict-
# dominance tie rules reduce to "running/prefix max >= y".
# ---------------------------------------------------------------------------

_XB = 200_000_000  # acctbal micro-unit bucket width (~55 buckets over TPC-H range)


@query(
    "skyline_suppliers",
    oracle=f"""
    WITH pts0 AS (
      SELECT s.s_suppkey,
             CAST(round(s.s_acctbal * 1000000) AS BIGINT) AS x,
             CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100)
                  AS BIGINT) AS y
      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_suppkey, s.s_acctbal
    ),
    -- strict dominance: among distinct (x, y) a point is dominated
    -- iff some point with greater-or-equal x (and any strict edge)
    -- has y >= its y; duplicates share a row so they can't knock
    -- each other out
    pts AS (SELECT x, y, min(s_suppkey) AS keep_key, count(*) AS n_dup
            FROM pts0 GROUP BY x, y),
    b AS (SELECT *, x // {_XB} AS bx FROM pts),
    bstats AS (SELECT bx, max(y) AS by FROM b GROUP BY bx),
    cum AS (
      SELECT bx, max(by) OVER (ORDER BY bx DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS higher_max
      FROM bstats
    ),
    loc AS (
      SELECT b.*, cum.higher_max,
             max(y) OVER (PARTITION BY b.bx ORDER BY x DESC, y DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS run_max
      FROM b JOIN cum ON b.bx = cum.bx
    )
    SELECT keep_key AS s_suppkey, x AS acctbal_micro, y AS revenue_cent
    FROM loc
    WHERE (higher_max IS NULL OR higher_max < y)
      AND (run_max IS NULL OR run_max < y)
    """,
)
def skyline_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers on the (acctbal, revenue) Pareto frontier via the
    bucketed prefix-max decomposition — see the module comment. Exact
    integer micro/cent units; a point survives iff no higher-x bucket
    reaches its y (tiny cumulative-max frame) AND no prior point in
    its own bucket's (x desc, y desc) order does (per-bucket window).
    At 100 TB the only per-row work is one bucket-keyed window; the
    cross-bucket coordination is a bucket-count-sized frame."""
    from pyspark.sql import Window as W

    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    pts0 = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .groupBy("s_suppkey", "s_acctbal")
        .agg(
            F.expr(
                "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)"
            ).alias("y")
        )
        .select(
            "s_suppkey",
            F.expr("CAST(round(s_acctbal * 1000000) AS BIGINT)").alias("x"),
            "y",
        )
    )
    pts = pts0.groupBy("x", "y").agg(
        F.min("s_suppkey").alias("keep_key"), F.count("*").alias("n_dup")
    )
    b = pts.select("*", F.expr(f"x div {_XB}").alias("bx"))
    bstats = b.groupBy("bx").agg(F.max("y").alias("by"))
    wcum = W.orderBy(F.desc("bx")).rowsBetween(W.unboundedPreceding, -1)
    cum = bstats.select("bx", F.max("by").over(wcum).alias("higher_max"))
    wrun = (
        W.partitionBy("bx")
        .orderBy(F.desc("x"), F.desc("y"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    loc = b.join(cum, "bx").select("*", F.max("y").over(wrun).alias("run_max"))
    return loc.filter(
        (F.col("higher_max").isNull() | (F.col("higher_max") < F.col("y")))
        & (F.col("run_max").isNull() | (F.col("run_max") < F.col("y")))
    ).select(
        F.col("keep_key").alias("s_suppkey"),
        F.col("x").alias("acctbal_micro"),
        F.col("y").alias("revenue_cent"),
    )


# ---------------------------------------------------------------------------
# geo_grid_dbscan — density-based clustering on the customer point
# cloud, DBSCAN recast for the grid: per-cell counts (one hash
# aggregate over the point scan), 3x3 neighborhood density via a
# 9-way shifted self-equi-join on the CELL table (combinable counts —
# no point-pair join anywhere), "core" = cells in the TOP DECILE of
# neighborhood density (percentile_disc threshold, so the operator is
# meaningful at any uniform-ish density and any SF), clusters = TRUE
# connected components of 8-adjacent core cells
# (ops.graph.connected_components run to convergence; the oracle
# computes the same fixpoint with a recursive CTE — the
# dedup_clusters convention).
# ---------------------------------------------------------------------------

_DB_CELL = 15_000_000
_LAT_MOD = 180_000_000
_LON_MOD = 360_000_000


def _dbscan_oracle() -> str:
    clat = sql_md5_long("'clat|' || CAST(c_custkey AS VARCHAR)")
    clon = sql_md5_long("'clon|' || CAST(c_custkey AS VARCHAR)")
    return f"""
    WITH RECURSIVE pts AS (
      SELECT ({clat} % {_LAT_MOD}) // {_DB_CELL} AS cy,
             ({clon} % {_LON_MOD}) // {_DB_CELL} AS cx
      FROM customer
    ),
    cells AS (SELECT cx, cy, count(*) AS n FROM pts GROUP BY cx, cy),
    hood AS (
      SELECT c.cx, c.cy, c.n, sum(o.n) AS hood_n
      FROM cells c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dxs
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dys
      JOIN cells o ON o.cx = c.cx + dxs.dx AND o.cy = c.cy + dys.dy
      GROUP BY c.cx, c.cy, c.n
    ),
    thr AS (SELECT quantile_disc(hood_n, 0.9) AS t FROM hood),
    core AS (
      SELECT cx, cy, n, hood_n, cx * 100000 + cy AS id
      FROM hood, thr WHERE hood_n >= thr.t
    ),
    adj0 AS (
      SELECT a.id AS src, b.id AS dst
      FROM core a
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dxs
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dys
      JOIN core b ON b.cx = a.cx + dxs.dx AND b.cy = a.cy + dys.dy
    ),
    reach AS (
      SELECT id, id AS lbl FROM core
      UNION
      SELECT e.dst, reach.lbl FROM reach JOIN adj0 e ON e.src = reach.id
    ),
    lab AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id)
    SELECT c.cx, c.cy, CAST(c.n AS BIGINT) AS n_points,
           CAST(c.hood_n AS BIGINT) AS hood_n,
           CAST(l.cluster AS BIGINT) AS cluster
    FROM core c JOIN lab l ON c.id = l.id
    """


@query("geo_grid_dbscan", oracle=_dbscan_oracle())
def geo_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density hotspot clustering (grid-DBSCAN): top-decile
    neighborhood-density cells, merged into TRUE connected components
    over 8-adjacency. See the module comment for the plan shape; the
    percentile threshold is a 1-row aggregate (broadcast-legitimate
    by construction), and component labeling runs to convergence with
    the recursive-CTE oracle checking the exact fixpoint.

    At 100 TB: cell stats are one combinable aggregate over the point
    scan; everything after touches the CELL table (orders of magnitude
    smaller); CC rounds ~ hotspot-chain diameter. Cell size follows
    the ops.geo density knob."""
    from ..ops.graph import connected_components

    cust = table(spark, sf_dir, "customer").select(
        (md5_long(F.concat(F.lit("clat|"), F.col("c_custkey"))) % _LAT_MOD).alias(
            "lat_u"
        ),
        (md5_long(F.concat(F.lit("clon|"), F.col("c_custkey"))) % _LON_MOD).alias(
            "lon_u"
        ),
    )
    pts = cust.select(
        F.expr(f"lat_u div {_DB_CELL}").alias("cy"),
        F.expr(f"lon_u div {_DB_CELL}").alias("cx"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count("*").alias("n"))
    nb = cells.select(
        "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
    ).select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"))
    o = cells.select(
        F.col("cx").alias("ox"), F.col("cy").alias("oy"), F.col("n").alias("on")
    )
    hood = (
        nb.join(
            o,
            (F.col("ox") == F.col("cx") + F.col("dx"))
            & (F.col("oy") == F.col("cy") + F.col("dy")),
        )
        .groupBy("cx", "cy", "n")
        .agg(F.sum("on").alias("hood_n"))
    )
    thr = hood.agg(
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY hood_n)").alias("t")
    )
    core = (
        hood.crossJoin(F.broadcast(thr))
        .filter(F.col("hood_n") >= F.col("t"))
        .select(
            "cx", "cy", "n", "hood_n", (F.col("cx") * 100000 + F.col("cy")).alias("id")
        )
    )
    ca = core.select("cx", "cy", F.col("id").alias("a_id"))
    na = ca.select(
        "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
    ).select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"))
    cb = core.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("id").alias("b_id")
    )
    adj = na.join(
        cb,
        (F.col("bx") == F.col("cx") + F.col("dx"))
        & (F.col("by") == F.col("cy") + F.col("dy")),
    ).select("a_id", "b_id")
    cc = connected_components(core.select("id"), adj, src_col="a_id", dst_col="b_id")
    return core.join(cc, "id").select(
        "cx",
        "cy",
        F.col("n").cast("bigint").alias("n_points"),
        F.col("hood_n").cast("bigint").alias("hood_n"),
        F.col("component").cast("bigint").alias("cluster"),
    )


# ---------------------------------------------------------------------------
# events_sequence_mining — sequential pattern counts: the top 3-step
# event-type sequences across user streams (the market-basket idea
# lifted to ORDERED behavior). Two lags per user stream turn sequence
# extraction into a per-key window projection; counting is one
# combinable aggregate over (sequence) — no self-joins, no explosion
# beyond one row per event. Full (ts, event_id) ordering key so tie
# order cannot differ across engines.
# ---------------------------------------------------------------------------


@query(
    "events_sequence_mining",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             lag(event_type, 2) OVER w AS e1,
             lag(event_type, 1) OVER w AS e2,
             event_type AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(epoch(ts) AS BIGINT), event_id)
    ),
    pat AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS pattern, user_id
      FROM seq WHERE e1 IS NOT NULL
    )
    SELECT pattern,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM pat
    GROUP BY pattern
    ORDER BY n_occurrences DESC, pattern
    LIMIT 20
    """,
)
def events_sequence_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent 3-step event-type sequences over per-user
    streams, with occurrence and distinct-user counts. One per-user
    window shuffle + one combinable pattern aggregate — sequence
    mining without self-joins (the naive formulation joins the event
    stream to itself twice)."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("tse")
    )
    w = W.partitionBy("user_id").orderBy("tse", "event_id")
    seq = ev.select(
        "user_id",
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("pattern"), "user_id"
        )
        .groupBy("pattern")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "pattern")
        .limit(20)
    )
