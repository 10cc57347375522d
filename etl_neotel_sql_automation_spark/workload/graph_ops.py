"""Graph workload: PageRank over the customer-supplier interaction
graph, differentially checked against an unrolled-iteration oracle.

Iterative float algorithms normally can't be hash-compared across
engines (summation order drifts); ops.graph.pagerank_int runs the
whole computation in exact bigint arithmetic, so 3 iterations unroll
into 3 CTE rounds of integer math that DuckDB reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from ..ops.graph import pagerank_int

_SCALE = 10**12
_SUPP_OFFSET = 100000


def _pagerank_oracle(iters: int = 3, scale: int = _SCALE) -> str:
    head = f"""
    WITH raw AS (
      SELECT DISTINCT o_custkey AS a, {_SUPP_OFFSET} + l_suppkey AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (SELECT a AS src, b AS dst FROM raw
              UNION ALL SELECT b AS src, a AS dst FROM raw),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    params AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT id, CAST({scale} // n AS BIGINT) AS rank FROM nodes, params)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
    c{i} AS (
      SELECT e.dst AS id, SUM(r.rank // d.out_deg) AS s
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.id
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.id,
             CAST((15 * {scale}) // (100 * p.n) AS BIGINT)
               + (85 * COALESCE(c{i}.s, 0)) // 100 AS rank
      FROM nodes n CROSS JOIN params p
      LEFT JOIN c{i} ON n.id = c{i}.id
    )""")
    return (
        head
        + ","
        + ",".join(rounds)
        + f"""
    SELECT id, CAST(rank AS BIGINT) AS rank_int FROM r{iters}
    """
    )


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the undirected bipartite graph of
    customers and the suppliers they bought from (supplier ids offset
    so the two key spaces stay disjoint). Exact integer arithmetic
    end-to-end — see ops.graph.pagerank_int."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.lit(_SUPP_OFFSET) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return pagerank_int(edges, iters=3, scale=_SCALE).select(
        "id", F.col("rank").alias("rank_int")
    )


def _lpa_oracle(iters: int = 3) -> str:
    head = f"""
    WITH raw AS (
      SELECT DISTINCT o_custkey AS a, {_SUPP_OFFSET} + l_suppkey AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges0 AS (SELECT a AS src, b AS dst FROM raw
               UNION ALL SELECT b AS src, a AS dst FROM raw),
    edges AS (SELECT DISTINCT src, dst FROM edges0),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    l0 AS (SELECT id, id AS label FROM nodes)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
    v{i} AS (
      SELECT e.src AS id, l.label, count(*) AS votes
      FROM edges e JOIN l{i - 1} l ON e.dst = l.id
      GROUP BY e.src, l.label
    ),
    w{i} AS (
      SELECT id, label,
             row_number() OVER (PARTITION BY id ORDER BY votes DESC, label) AS rn
      FROM v{i}
    ),
    l{i} AS (
      SELECT n.id, coalesce(w.label, p.label) AS label
      FROM nodes n
      JOIN l{i - 1} p ON n.id = p.id
      LEFT JOIN (SELECT id, label FROM w{i} WHERE rn = 1) w ON n.id = w.id
    )""")
    return (
        head + "," + ",".join(rounds)
        + f"\n    SELECT id, CAST(label AS BIGINT) AS label FROM l{iters}\n    "
    )


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous majority-vote label
    propagation (3 fixed rounds, ties to the smallest label) over the
    same customer-supplier purchase graph as graph_pagerank — the
    second graph-analytics modality (density-respecting communities vs
    connected components' pure reachability). Fully integer/count
    arithmetic, so the unrolled-CTE oracle reproduces every round
    bit-for-bit. See ops.graph.label_propagation for the at-scale
    shape (one edge join + combinable vote count + argmax window per
    round, lineage checkpoint-truncated)."""
    from ..ops.graph import label_propagation

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.lit(_SUPP_OFFSET) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = raw.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return label_propagation(nodes, edges, iters=3)
