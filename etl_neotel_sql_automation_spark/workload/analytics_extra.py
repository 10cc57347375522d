"""Additional analytic shapes: gaps-and-islands (activity streaks),
URL parsing, and equi-width histograms over global stats.

Each is a distinct plan shape not covered elsewhere in the registry:
the islands date-arithmetic grouping trick (vs sessionize's lag-gap
cumsum), a regexp-structured extraction pipeline, and a bucketing
aggregate driven by a broadcast 1-row global-stats join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table


@query(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    anchored AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
             count(*) AS n_days
      FROM anchored GROUP BY user_id, anchor
    ),
    best AS (
      SELECT user_id, streak_start, streak_end, n_days,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n_days DESC, streak_start) AS rk
      FROM streaks
    )
    SELECT user_id, streak_start, streak_end, n_days
    FROM best WHERE rk = 1
    """,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive active
    days. The islands come from the date-arithmetic trick (day minus
    row_number is constant within a consecutive run) — one distinct,
    one window, one groupBy, one window; no self-join, which is what
    keeps islands detection linear at scale."""
    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    anchored = days.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
        F.count("*").alias("n_days"),
    )
    wb = W.partitionBy("user_id").orderBy(F.desc("n_days"), "streak_start")
    return (
        streaks.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select("user_id", "streak_start", "streak_end", "n_days")
    )


_URL_HOST = r"https?://([^/]+)/"
_URL_PATH = r"https?://[^/]+(/[^?#]*)"


@query(
    "text_url_extract",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             'https://www.' || source || '.example.com/docs/' ||
             lang || '/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    parsed AS (
      SELECT doc_id,
             regexp_extract(url, '{_URL_HOST}', 1) AS host,
             regexp_extract(url, '{_URL_PATH}', 1) AS path
      FROM seeded
    )
    SELECT host,
           count(*) AS n_docs,
           count(DISTINCT path) AS n_paths
    FROM parsed GROUP BY host
    """,
)
def text_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structure extraction — the domain-grouping step behind
    per-domain quotas and crawl stats. Documents carry no URLs, so
    both engines seed one deterministically from (source, lang,
    doc_id), then parse host and path by the same regexes (identical
    regexp_extract signatures in Spark and DuckDB) and aggregate per
    host. Pure codegen projection + one hash aggregate."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    parsed = docs.select(
        F.regexp_extract(url, _URL_HOST, 1).alias("host"),
        F.regexp_extract(url, _URL_PATH, 1).alias("path"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("path").alias("n_paths"),
    )


@query(
    "agg_histogram_price",
    oracle="""
    WITH s AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    ),
    b AS (
      SELECT CAST(least(floor((o_totalprice - s.lo) / ((s.hi - s.lo) / 10)),
                        9) AS INT) AS bucket,
             o_totalprice
      FROM orders CROSS JOIN s
    )
    SELECT bucket, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
    FROM b GROUP BY bucket
    """,
)
def agg_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over global min/max: the 1-row stats
    aggregate broadcasts into a bucketing projection, then one hash
    aggregate per bucket. The same two-pass shape computes any
    global-normalized feature (z-scores, quantile bins) at scale —
    pass one reduces to one row, pass two is a full scan with the row
    broadcast; no window over the whole table."""
    orders = table(spark, sf_dir, "orders")
    s = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10)
        ),
        F.lit(9),
    ).cast("int")
    return (
        orders.crossJoin(F.broadcast(s))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


@query(
    "join_fuzzy_names",
    oracle="""
    WITH probes AS (
      SELECT c_custkey AS probe_key,
             substr(c_name, 1, 11) || 'X' || substr(c_name, 13)
               AS probe_name
      FROM customer WHERE c_custkey % 29 = 0
    )
    SELECT probe_key, probe_name, c_custkey AS match_key,
           levenshtein(probe_name, c_name) AS edit_dist
    FROM probes
    JOIN customer
      ON substr(probe_name, length(probe_name) - 2, 3)
         = substr(c_name, length(c_name) - 2, 3)
    WHERE levenshtein(probe_name, c_name) <= 1
    ORDER BY probe_key, match_key
    """,
)
def join_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (edit-distance) join: probe names with one
    corrupted character are matched back to customers by Levenshtein
    distance <= 1, with a BLOCKING equi-join on the 3-char suffix so
    the expensive distance function only runs inside blocks — never
    over the cross product. The blocking key must come from the
    region the corruption cannot touch (here: corruption is confined
    to a middle digit, so the suffix survives); for arbitrary
    corruption the general path is q-gram blocking with stop-gram
    removal (explode shared rare n-grams, equi-join on gram, distinct
    pairs, then the distance filter) — same plan shape, wider
    blocks. At 100 TB the block join shuffles on short keys and the
    distance filter is codegen (no UDF)."""
    cust = table(spark, sf_dir, "customer")
    probes = cust.filter(F.col("c_custkey") % 29 == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.substring("c_name", 1, 11),
            F.lit("X"),
            F.expr("substr(c_name, 13)"),
        ).alias("probe_name"),
    )
    block = lambda c: F.substring(c, -3, 3)  # noqa: E731
    return (
        probes.join(cust, block(F.col("probe_name")) == block(F.col("c_name")))
        .filter(F.levenshtein("probe_name", "c_name") <= 1)
        .select(
            "probe_key",
            "probe_name",
            F.col("c_custkey").alias("match_key"),
            F.levenshtein("probe_name", "c_name").alias("edit_dist"),
        )
        .orderBy("probe_key", "match_key")
    )


_URL_CHOST = r"(?i)^https?://([^/?#]+)"
_URL_CPATH = r"(?i)^https?://[^/?#]+([^?#]*)"


@query(
    "dedup_url_canonical",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0
                   THEN upper('https://www.' || source || '.example.com')
                   ELSE 'https://www.' || source || '.example.com' END)
             || '/page/' || CAST(doc_id % 100 AS VARCHAR)
             || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             'https://' || lower(regexp_extract(url, '{_URL_CHOST}', 1))
             || regexp_replace(regexp_extract(url, '{_URL_CPATH}', 1), '/+$', '')
               AS canon_url
      FROM seeded
    )
    SELECT canon_url, count(*) AS n_docs, min(doc_id) AS keep_id
    FROM canon GROUP BY canon_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the first dedup a crawl pipeline
    runs, BEFORE any content hashing: case-fold the host, strip query
    strings / fragments / trailing slashes, and collapse documents
    sharing a canonical URL (keep = min doc id). Documents carry no
    URLs, so both engines seed deliberately-messy variants
    deterministically (mixed-case host, ?utm, #fragment, trailing
    slash, colliding paths via doc_id % 100) and must agree on the
    canonical groups. Pure codegen regexp chain + one hash aggregate."""
    docs = table(spark, sf_dir, "documents")
    base = F.concat(F.lit("https://www."), F.col("source"), F.lit(".example.com"))
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.upper(base)).otherwise(base),
        F.lit("/page/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    canon = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_extract(url, _URL_CHOST, 1)),
        F.regexp_replace(F.regexp_extract(url, _URL_CPATH, 1), r"/+$", ""),
    )
    return (
        docs.select("doc_id", canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


@query(
    "orders_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey, last_order, frequency, monetary_cents,
             CAST(ntile(5) OVER (ORDER BY last_order DESC, custkey) AS INTEGER) AS r,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS INTEGER) AS f,
             CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, custkey) AS INTEGER) AS m
      FROM cust
    )
    SELECT r, f, m,
           count(*) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS segment_cents,
           min(custkey) AS example_custkey
    FROM scored GROUP BY r, f, m
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quintiles (1 = best) and the resulting 5×5×5 segment grid with
    size and revenue per cell: the classic marketing-analytics rollup,
    exercising global ntile windows over an aggregated (dimension-
    sized) frame, never over raw orders. Ties are totally ordered by
    (metric, custkey) so quintile boundaries are deterministic and
    cross-engine identical; money stays in exact cents."""
    orders = table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    scored = cust.select(
        "custkey",
        "monetary_cents",
        F.ntile(5).over(W.orderBy(F.desc("last_order"), "custkey")).alias("r"),
        F.ntile(5).over(W.orderBy(F.desc("frequency"), "custkey")).alias("f"),
        F.ntile(5).over(W.orderBy(F.desc("monetary_cents"), "custkey")).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        F.sum("monetary_cents").alias("segment_cents"),
        F.min("custkey").alias("example_custkey"),
    )


@query(
    "orders_gini_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, custkey) AS BIGINT) AS i
      FROM cust
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(cents) AS HUGEINT) AS total,
             CAST(sum(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS weighted
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(total AS BIGINT) AS total_cents,
           CAST(floor((2 * weighted - (n + 1) * total) * 1000000.0
                      / (n * total)) AS BIGINT) AS gini_ppm
    FROM s
    """,
)
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-revenue concentration — the
    single-number complement to the Pareto top-100 listing, from the
    exact rank-weighted form G = (2*Σ i*x_i − (n+1)*Σ x) / (n*Σ x)
    over ascending exact cents (ties totally ordered by custkey). All
    moments are exact integers (DECIMAL(38,0)/HUGEINT for the rank-
    weighted sum), the single division is IEEE-identical, and the
    output is floor-ppm — zero float-tie exposure. One window over the
    aggregated customer frame + one global reduce."""
    orders = table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents).alias("cents")
    )
    ranked = cust.withColumn(
        "i", F.row_number().over(W.orderBy("cents", "custkey")).cast("long")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total"),
        F.sum(dec(F.col("i")) * dec(F.col("cents"))).alias("weighted"),
    )
    n, total, weighted = dec(F.col("n")), dec(F.col("total")), F.col("weighted")
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        F.floor(
            (2 * weighted - (n + 1) * total).cast("double")
            * 1_000_000.0
            / (n * total).cast("double")
        )
        .cast("long")
        .alias("gini_ppm"),
    )
