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


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus                                   AS status_val,
           CAST(2 AS INTEGER)                              AS n_keys,
           TRUE                                            AS has_status,
           o_orderpriority                                 AS prio_val,
           concat(o_orderstatus, ':', o_orderpriority)     AS packed
    FROM orders WHERE o_orderkey < 200
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed scalar surface: map_from_arrays construction,
    element_at lookup, map_keys cardinality, map_contains_key,
    transform_values, and a map_entries fold — exercised on the Spark
    side, while the oracle states the EXPECTED scalar results directly
    from the underlying columns (maps never cross the comparison
    boundary: the driver canonicalizer hashes scalars, and the lookup
    results are pure functions of the row). All lookups hit inside the
    map, so no ANSI out-of-key concerns."""
    from pyspark.sql import functions as F

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("priority")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    packed = F.aggregate(
        F.map_entries(F.map_filter(m, lambda k, v: k == "status")),
        F.lit("").cast("string"),
        lambda acc, e: F.concat(acc, e["value"]),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, F.lit("status")).alias("status_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.map_contains_key(m, F.lit("status")).alias("has_status"),
        F.element_at(
            F.transform_values(m, lambda k, v: F.upper(v)), F.lit("priority")
        ).alias("prio_val"),
        F.concat(packed, F.lit(":"), F.element_at(m, F.lit("priority"))).alias(
            "packed"
        ),
    )


@query("lateral_topk_dfapi", oracle=_LATERAL_SQL)
def lateral_topk_dfapi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same LATERAL top-3-per-nation as sql_lateral_topk, but
    through Spark 4's DataFrame ``lateralJoin`` API with an
    ``.outer()`` correlated column reference — the programmatic face
    of the ANSI LATERAL form, sharing the identical DuckDB oracle
    text. Catalyst decorrelates both into the same join +
    per-key-limit plan; registering both pins SQL-string and
    DataFrame-API entry points to one semantics."""
    from pyspark.sql import functions as F

    n = table(spark, sf_dir, "nation").alias("n")
    c = table(spark, sf_dir, "customer").alias("c")
    return n.lateralJoin(
        c.where(F.col("c.c_nationkey") == F.col("n.n_nationkey").outer())
        .select("c_custkey", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(3)
    ).select("n_name", "c_custkey", "c_acctbal")


@query(
    "scalar_url_funcs",
    oracle="""
    SELECT doc_id,
           source || '.example.com'                          AS host,
           '/docs/' || CAST(doc_id AS VARCHAR)               AS path,
           'lang=' || lang                                   AS qs,
           lang                                              AS lang_param,
           'a+b%26c'                                         AS encoded,
           'a b&c'                                           AS decoded
    FROM documents WHERE doc_id < 50
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The URL scalar surface: ``parse_url`` HOST/PATH/QUERY and
    keyed-QUERY extraction over URLs synthesized from row data, plus
    ``url_encode``/``url_decode`` round-trips (form-encoding: space -> ``+``). Exercised on the Spark
    side; the oracle states the expected components directly from the
    underlying columns (DuckDB has no parse_url — the VALUES are the
    contract, the scalar_map_funcs pattern). The dedup_url_canonical
    query normalizes URLs with regexes; this covers the built-in
    parser a warehouse reaches for first."""
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("qs"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.url_encode(F.lit("a b&c")).alias("encoded"),
        F.url_decode(F.lit("a%20b%26c")).alias("decoded"),
    )


@query(
    "report_transpose_regions",
    oracle="""
    WITH agg AS (
      SELECT r.r_name, CAST(count(*) AS BIGINT) AS n
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name
    )
    SELECT 'v' AS key,
           CAST(max(CASE WHEN r_name = 'AFRICA' THEN n END) AS VARCHAR) AS "AFRICA",
           CAST(max(CASE WHEN r_name = 'AMERICA' THEN n END) AS VARCHAR) AS "AMERICA",
           CAST(max(CASE WHEN r_name = 'ASIA' THEN n END) AS VARCHAR) AS "ASIA",
           CAST(max(CASE WHEN r_name = 'EUROPE' THEN n END) AS VARCHAR) AS "EUROPE",
           CAST(max(CASE WHEN r_name = 'MIDDLE EAST' THEN n END) AS VARCHAR)
             AS "MIDDLE EAST"
    FROM agg
    """,
)
def report_transpose_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``DataFrame.transpose``: the per-region customer
    count flipped so regions become COLUMNS — the report-layout
    operation BI hand-off tables want (pivot_flag_status pivots
    values of one column; transpose flips the whole frame). The
    index column's values become column names, so this belongs only
    on DIMENSION-sized frames — transpose collects the index
    driver-side by design, which is exactly why the input here is
    the 5-row region aggregate and never a fact table. The oracle
    states the transposed layout as conditional aggregation (the
    relational equivalent) with the same region-name columns.
    """
    from pyspark.sql import functions as F

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    agg = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n"))
    )
    return (
        agg.select("r_name", F.col("n").cast("string").alias("v"))
        .transpose()
    )
