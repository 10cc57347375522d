"""SQL-language surface: recursive CTEs and LATERAL correlated
subqueries (both landed in Spark 4's ANSI SQL dialect).

Both queries here run the IDENTICAL SQL text on Spark (over temp views
of the parquet tables) and on DuckDB — the strongest possible parity
statement for the SQL front-end: not "equivalent plans", the same
query string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import TABLES, query, table


def _run_sql(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]) -> DataFrame:
    for t in tables:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_RECURSIVE_SQL = """
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS leaf, c_custkey AS node, c_acctbal AS bal, 0 AS depth
      FROM customer
      UNION ALL
      SELECT ch.leaf, p.c_custkey AS node, p.c_acctbal AS bal, ch.depth + 1
      FROM chain ch
      JOIN customer p
        ON p.c_custkey = CAST(floor((ch.node - 1) / 2.0) AS BIGINT)
      WHERE ch.node > 0
    )
    SELECT leaf AS c_custkey,
           max(depth)                AS n_ancestors,
           round(sum(bal), 4)        AS path_bal,
           CAST(count(*) AS BIGINT)  AS path_len
    FROM chain
    GROUP BY leaf
"""


@query("sql_recursive_hierarchy", oracle=_RECURSIVE_SQL)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (hierarchy walk): customers form an implicit
    binary tree (parent = floor((custkey-1)/2), exact for keys below
    2^53 so both engines walk the identical tree); each
    row walks its ancestor chain to the root, then aggregates path
    depth and path balance. Recursion depth is log2(customers) — ~21
    levels even at 10^6x the test data, and each recursion step is one
    equi-join, so the plan stays a short chain of joins at any scale.
    Spark executes the very same SQL string the DuckDB oracle runs."""
    return _run_sql(spark, sf_dir, _RECURSIVE_SQL, ("customer",))


_LATERAL_SQL = """
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 3
    ) t
"""


@query("sql_lateral_topk", oracle=_LATERAL_SQL)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: top-3 customers by balance per
    nation, expressed as a per-row dependent subquery rather than a
    window. Catalyst decorrelates this into a join + per-key limit —
    semantically the windowed top-k, syntactically the ANSI LATERAL
    form. Same SQL string on both engines."""
    return _run_sql(spark, sf_dir, _LATERAL_SQL, ("nation", "customer"))
