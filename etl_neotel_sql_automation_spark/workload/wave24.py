"""Round-6 wave-24 workloads: the binary-retrieval quality meter and
CLV model inputs — emb_binary_quality (the house standard says every
approximate path ships with a differential recall meter: how much of
the exact cosine top-10 does sign-bit Hamming recover? 64 bits is a
brutal quantizer; the meter is what tells a user whether it's brutal
ENOUGH for their recall SLO), and orders_pareto_nbd_inputs (the
sufficient statistics of the Pareto/NBD / BG-NBD customer-lifetime
models: per-customer frequency, recency, T — the extract every CLV
fit starts from, exact in days).

Determinism rules (house style): the exact leg ranks raw cosine with
a neighbor-id tiebreak (the sim_cosine_topk precedent, green at both
SFs since r1); overlap and recall are pure integer set arithmetic on
the two engines' own top-k sets; day arithmetic on date-truncated
timestamps.

Scale notes: the meter's exact leg is query-bounded (5 vectors)
brute force — the metering recipe at 100 TB is the hash-sampled twin
pattern (sim_margin_quality_sampled); the NBD extract is one
customer-keyed combinable aggregate against one 1-row corpus-end
scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from .wave23 import _BH_K, _BH_QUERIES, binary_hamming_frame

# ---------------------------------------------------------------------------
# emb_binary_quality — per-query overlap of Hamming top-10 vs exact
# cosine top-10 (queries vec_id < 5, corpus the rest), plus the pooled
# recall in ppm repeated per row.
# ---------------------------------------------------------------------------

_SQL_PACK_Q = """
      SELECT vec_id,
             CAST(sum(CASE WHEN dim <= 32 AND v[dim] > 0
                           THEN (CAST(1 AS BIGINT) << (dim - 1))
                           ELSE 0 END) AS BIGINT) AS w1,
             CAST(sum(CASE WHEN dim > 32 AND v[dim] > 0
                           THEN (CAST(1 AS BIGINT) << (dim - 33))
                           ELSE 0 END) AS BIGINT) AS w2
      FROM (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               unnest(range(1, len(embedding) + 1)) AS dim
        FROM embeddings
      ) GROUP BY vec_id
"""


@query(
    "emb_binary_quality",
    oracle=f"""
    WITH packed AS ({_SQL_PACK_Q}),
    bq AS (SELECT vec_id AS qid, w1 AS q1, w2 AS q2 FROM packed
           WHERE vec_id < {_BH_QUERIES}),
    bc AS (SELECT * FROM packed WHERE vec_id >= {_BH_QUERIES}),
    bin AS (
      SELECT qid, neighbor FROM (
        SELECT bq.qid, bc.vec_id AS neighbor,
               row_number() OVER (
                 PARTITION BY bq.qid
                 ORDER BY bit_count(xor(bq.q1, bc.w1))
                          + bit_count(xor(bq.q2, bc.w2)), bc.vec_id) AS rnk
        FROM bq CROSS JOIN bc
      ) WHERE rnk <= {_BH_K}
    ),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < {_BH_QUERIES}),
    c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
          FROM embeddings WHERE vec_id >= {_BH_QUERIES}),
    exact AS (
      SELECT qid, n_id FROM (
        SELECT q.qid, c.n_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qv, c.nv) DESC, c.n_id)
                 AS rnk
        FROM q CROSS JOIN c
      ) WHERE rnk <= {_BH_K}
    ),
    per_q AS (
      SELECT exact.qid,
             CAST(count(bin.neighbor) AS BIGINT) AS n_overlap
      FROM exact LEFT JOIN bin
        ON exact.qid = bin.qid AND exact.n_id = bin.neighbor
      GROUP BY exact.qid
    )
    SELECT qid, n_overlap,
           CAST((1000000 * n_overlap) // {_BH_K} AS BIGINT)
             AS recall_q_ppm,
           CAST((1000000 * sum(n_overlap) OVER ())
                // ({_BH_QUERIES} * {_BH_K}) AS BIGINT) AS recall_ppm
    FROM per_q ORDER BY qid
    """,
)
def emb_binary_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential recall meter for sign-bit Hamming retrieval:
    per-query overlap with the exact cosine top-10 and the pooled
    recall ppm."""
    return binary_quality_frame(table(spark, sf_dir, "embeddings"))


def binary_quality_frame(emb: DataFrame) -> DataFrame:
    """Frame core of emb_binary_quality (scaling-probe entry)."""
    from ..ops import similarity as S

    bin_topk = binary_hamming_frame(emb).select(
        "qid", F.col("neighbor").alias("b_neighbor")
    )
    exact = S.brute_force_topk(
        emb.filter(F.col("vec_id") >= _BH_QUERIES),
        emb.filter(F.col("vec_id") < _BH_QUERIES),
        k=_BH_K,
    ).select(F.col("q_id").alias("qid"), F.col("n_id").alias("neighbor"))
    per_q = (
        exact.join(
            bin_topk,
            (exact.qid == bin_topk.qid)
            & (exact.neighbor == bin_topk.b_neighbor),
            "left",
        )
        .groupBy(exact.qid)
        .agg(F.count("b_neighbor").cast("bigint").alias("n_overlap"))
    )
    # pooled recall as an unpartitioned window over the <=|queries|-row
    # per-query frame: ONE pass — the 1-row-aggregate crossJoin shape
    # recomputed the whole retrieval branch for the pool consumer
    # (the wave-31 rank-metrics probe measured the same shape at 2.4x)
    return per_q.select(
        "qid",
        "n_overlap",
        F.expr(
            f"CAST((1000000 * n_overlap) div {_BH_K} AS BIGINT)"
        ).alias("recall_q_ppm"),
        F.expr(
            f"CAST((1000000 * sum(n_overlap) OVER ())"
            f" div ({_BH_QUERIES} * {_BH_K}) AS BIGINT)"
        ).alias("recall_ppm"),
    ).orderBy("qid")


# ---------------------------------------------------------------------------
# orders_pareto_nbd_inputs — the (frequency x, recency t_x, T)
# sufficient statistics per customer: x = repeat orders, t_x = days
# from first to last order, T = days from first order to the corpus
# observation end (max order date). The extract a Pareto/NBD or
# BG-NBD CLV fit consumes; registered beside orders_cohort_ltv so the
# model-based and empirical CLV paths share the engine.
# ---------------------------------------------------------------------------


@query(
    "orders_pareto_nbd_inputs",
    oracle="""
    WITH obs AS (
      SELECT CAST(date_trunc('day', max(o_orderdate)) AS DATE) AS end_day
      FROM orders
    ),
    cust AS (
      SELECT o_custkey,
             CAST(count(*) - 1 AS BIGINT) AS frequency,
             CAST(date_trunc('day', min(o_orderdate)) AS DATE) AS first_day,
             CAST(date_trunc('day', max(o_orderdate)) AS DATE) AS last_day
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey, frequency,
           CAST(date_diff('day', first_day, last_day) AS BIGINT)
             AS recency_days,
           CAST(date_diff('day', first_day, (SELECT end_day FROM obs))
                AS BIGINT) AS t_days
    FROM cust ORDER BY custkey
    """,
)
def orders_pareto_nbd_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/NBD sufficient statistics per customer: repeat frequency,
    recency (first->last, days), and observation age T (first->corpus
    end, days)."""
    return pareto_nbd_frame(table(spark, sf_dir, "orders"))


def pareto_nbd_frame(orders: DataFrame) -> DataFrame:
    """Frame core of orders_pareto_nbd_inputs (scaling-probe entry)."""
    obs = orders.agg(
        F.date_trunc("day", F.max("o_orderdate")).cast("date").alias("end_day")
    )
    cust = orders.groupBy("o_custkey").agg(
        (F.count("*") - 1).cast("bigint").alias("frequency"),
        F.date_trunc("day", F.min("o_orderdate")).cast("date").alias(
            "first_day"
        ),
        F.date_trunc("day", F.max("o_orderdate")).cast("date").alias(
            "last_day"
        ),
    )
    return (
        cust.crossJoin(F.broadcast(obs))  # 1-row observation end
        .select(
            F.col("o_custkey").alias("custkey"),
            "frequency",
            F.datediff("last_day", "first_day").cast("bigint").alias(
                "recency_days"
            ),
            F.datediff("end_day", "first_day").cast("bigint").alias("t_days"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# emb_binary_rerank_topk — the DEPLOYMENT shape of binary retrieval:
# sign bits are a candidate GENERATOR, not a ranker. Hamming top-500
# candidates per query, exact cosine only on those candidates, top-10
# of the reranked set. emb_binary_quality measures the direct path at
# 0.16 recall — the meter that says "rerank or go home"; the rerank
# restores it to 0.96 at sf0.1 (candidate-pool sweep: 100 -> 0.60,
# 500 -> 0.96, 1000 -> 1.00; 500 chosen as the knee) while the
# exact-cosine work stays candidate-bounded instead of corpus-sized.
# ---------------------------------------------------------------------------

_BH_CAND = 500


def _rerank_sql(select_clause: str) -> str:
    return f"""
    WITH packed AS ({_SQL_PACK_Q}),
    bq AS (SELECT vec_id AS qid, w1 AS q1, w2 AS q2 FROM packed
           WHERE vec_id < {_BH_QUERIES}),
    bc AS (SELECT * FROM packed WHERE vec_id >= {_BH_QUERIES}),
    cand AS (
      SELECT qid, neighbor FROM (
        SELECT bq.qid, bc.vec_id AS neighbor,
               row_number() OVER (
                 PARTITION BY bq.qid
                 ORDER BY bit_count(xor(bq.q1, bc.w1))
                          + bit_count(xor(bq.q2, bc.w2)), bc.vec_id) AS rnk
        FROM bq CROSS JOIN bc
      ) WHERE rnk <= {_BH_CAND}
    ),
    qv AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < {_BH_QUERIES}),
    cv AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id >= {_BH_QUERIES}),
    rer AS (
      SELECT qid, n_id, sim, rnk FROM (
        SELECT cand.qid, cand.neighbor AS n_id,
               round(list_cosine_similarity(qv.v, cv.v), 6) AS sim,
               row_number() OVER (
                 PARTITION BY cand.qid
                 ORDER BY list_cosine_similarity(qv.v, cv.v) DESC,
                          cand.neighbor) AS rnk
        FROM cand JOIN qv ON cand.qid = qv.qid
                  JOIN cv ON cand.neighbor = cv.n_id
      ) WHERE rnk <= {_BH_K}
    ),
    exact AS (
      SELECT qid, n_id, rnk AS e_rnk FROM (
        SELECT q.qid, c.n_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qv, c.nv) DESC, c.n_id)
                 AS rnk
        FROM (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < {_BH_QUERIES}) q
        CROSS JOIN (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
                    FROM embeddings WHERE vec_id >= {_BH_QUERIES}) c
      ) WHERE rnk <= {_BH_K}
    )
    {select_clause}
    """


@query(
    "emb_binary_rerank_topk",
    oracle=_rerank_sql(f"""
    SELECT qid, CAST(rnk AS INTEGER) AS rnk, n_id AS neighbor, sim
    FROM rer ORDER BY qid, rnk
    """),
)
def emb_binary_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-prefilter + exact-rerank retrieval: Hamming top-_BH_CAND
    candidates, exact cosine rerank, top-10."""
    return binary_rerank_frame(table(spark, sf_dir, "embeddings"))


def _binary_candidates(emb: DataFrame) -> DataFrame:
    """Hamming top-_BH_CAND candidate pairs (qid, neighbor)."""
    from pyspark.sql import Window as W

    from .wave23 import pack_sign_words

    packed = pack_sign_words(emb)  # one unrolled projection, no shuffle
    q = packed.filter(F.col("vec_id") < _BH_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("w1").alias("q1"),
        F.col("w2").alias("q2"),
    )
    c = packed.filter(F.col("vec_id") >= _BH_QUERIES)
    # broadcast the literally-bounded query side (vec_id < 5): the
    # unhinted form planned as a 32x32 CartesianProduct that re-read
    # the corpus-side packing once per partition pair (measured 380 s
    # at the 100x probe); the broadcast NL join scans the corpus ONCE
    d = c.crossJoin(F.broadcast(q)).select(
        "qid",
        F.col("vec_id").alias("neighbor"),
        F.expr(
            "CAST(bit_count(q1 ^ w1) + bit_count(q2 ^ w2) AS BIGINT)"
        ).alias("hamming"),
    )
    # two-phase distributed top-k (see wave23.binary_hamming_frame):
    # a per-query window sorts the whole corpus in |queries| tasks —
    # measured 158 s at the 100x probe; bucketed pre-top-k
    # parallelizes it with bit-identical output
    salted = d.withColumn(
        "salt", F.pmod(F.xxhash64("neighbor"), F.lit(32))
    )
    wb = W.partitionBy("qid", "salt").orderBy("hamming", "neighbor")
    survivors = (
        salted.withColumn("brnk", F.row_number().over(wb))
        .filter(F.col("brnk") <= _BH_CAND)
        .drop("brnk", "salt")
    )
    w = W.partitionBy("qid").orderBy("hamming", "neighbor")
    return (
        survivors.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BH_CAND)
        .select("qid", "neighbor")
    )


def binary_rerank_frame(emb: DataFrame) -> DataFrame:
    """Frame core of emb_binary_rerank_topk (scaling-probe entry)."""
    from pyspark.sql import Window as W

    cand = _binary_candidates(emb)
    qv = emb.filter(F.col("vec_id") < _BH_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("q_v"),
    )
    cv = emb.filter(F.col("vec_id") >= _BH_QUERIES).select(
        F.col("vec_id").alias("neighbor"),
        F.col("embedding").cast("array<double>").alias("c_v"),
    )
    dot = (
        "aggregate(zip_with(q_v, c_v, (a, b) -> a * b), 0.0d, (s, x) -> s + x)"
    )
    nrm = (
        "sqrt(aggregate(q_v, 0.0d, (s, x) -> s + x * x))"
        " * sqrt(aggregate(c_v, 0.0d, (s, x) -> s + x * x))"
    )
    scored = (
        cand.join(qv, "qid")
        .join(cv, "neighbor")
        .select(
            "qid", "neighbor", F.expr(f"({dot}) / ({nrm})").alias("raw_sim")
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("raw_sim"), F.asc("neighbor"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BH_K)
        .select(
            "qid",
            F.col("rnk").cast("int").alias("rnk"),
            "neighbor",
            F.round("raw_sim", 6).alias("sim"),
        )
        .orderBy("qid", "rnk")
    )


@query(
    "emb_binary_rerank_quality",
    oracle=_rerank_sql(f"""
    , per_q AS (
      SELECT exact.qid,
             CAST(count(rer.n_id) AS BIGINT) AS n_overlap
      FROM exact LEFT JOIN rer
        ON exact.qid = rer.qid AND exact.n_id = rer.n_id
      GROUP BY exact.qid
    )
    SELECT qid, n_overlap,
           CAST((1000000 * n_overlap) // {_BH_K} AS BIGINT)
             AS recall_q_ppm,
           CAST((1000000 * sum(n_overlap) OVER ())
                // ({_BH_QUERIES} * {_BH_K}) AS BIGINT) AS recall_ppm
    FROM per_q ORDER BY qid
    """),
)
def emb_binary_rerank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential recall meter for the rerank path: overlap of the
    Hamming-prefiltered exact-reranked top-10 with the true exact
    top-10."""
    return binary_rerank_quality_frame(table(spark, sf_dir, "embeddings"))


def binary_rerank_quality_frame(emb: DataFrame) -> DataFrame:
    """Frame core of emb_binary_rerank_quality (scaling-probe entry)."""
    from ..ops import similarity as S

    rer = binary_rerank_frame(emb).select(
        "qid", F.col("neighbor").alias("b_neighbor")
    )
    exact = S.brute_force_topk(
        emb.filter(F.col("vec_id") >= _BH_QUERIES),
        emb.filter(F.col("vec_id") < _BH_QUERIES),
        k=_BH_K,
    ).select(F.col("q_id").alias("qid"), F.col("n_id").alias("neighbor"))
    per_q = (
        exact.join(
            rer,
            (exact.qid == rer.qid) & (exact.neighbor == rer.b_neighbor),
            "left",
        )
        .groupBy(exact.qid)
        .agg(F.count("b_neighbor").cast("bigint").alias("n_overlap"))
    )
    # pooled recall as an unpartitioned window over the <=|queries|-row
    # per-query frame: ONE pass — the 1-row-aggregate crossJoin shape
    # recomputed the whole retrieval branch for the pool consumer
    # (the wave-31 rank-metrics probe measured the same shape at 2.4x)
    return per_q.select(
        "qid",
        "n_overlap",
        F.expr(
            f"CAST((1000000 * n_overlap) div {_BH_K} AS BIGINT)"
        ).alias("recall_q_ppm"),
        F.expr(
            f"CAST((1000000 * sum(n_overlap) OVER ())"
            f" div ({_BH_QUERIES} * {_BH_K}) AS BIGINT)"
        ).alias("recall_ppm"),
    ).orderBy("qid")
