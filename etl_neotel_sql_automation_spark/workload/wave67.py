"""Round-8 wave-67 workload: sim_rocchio_feedback — pseudo-relevance
feedback, the classical IR retrieval refinement: retrieve top-10 by
cosine, move the query toward the centroid of what it retrieved
(Rocchio: q' = alpha*q + beta*mean(top-k)), retrieve again with the
updated query, and read how the result list moved. The similarity
family covers first-pass retrieval (brute/LSH/IVF/PQ), reranking
(MMR, binary rerank) and fusion (RRF); feedback is the missing loop —
the query-UPDATE step — and its overlap diagnostic is the standard
"did feedback drift the query?" readout.

Determinism: vectors are quantized to integer micro-units
(round(x*1e6) — the _SQL_QV idiom), so dot products and the
element-wise top-10 SUMS are exact integer-valued doubles (order-free
below 2^53), and the Rocchio update uses INTEGER weights via scale
invariance of cosine: q' = 40*q + 3*sum(top10) == alpha 1 / beta 0.75
on the mean. Cosines are one exact-dot / sqrt-product divide, round 6;
rank ties break by neighbor id.

Scale shape: two broadcast-query corpus scans (the initial retrieval
and the re-retrieval — inherent to feedback), a 50-row centroid
aggregate between them, and a 64-element array rebuild per query.
Both broadcast sides are bounded by construction: the literal
vec_id < 5 query set, and the 5-row updated-query frame derived from
it (allowlisted: tests/test_plans.py CORPUS_HINT_ALLOWED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table

_N_Q = 5
_K = 10
_DIM = 64


def _quant(col):
    return F.transform(
        F.col(col).cast("array<double>"), lambda x: F.round(x * 1e6)
    )


def _cos(qv, nv):
    dot = F.aggregate(
        F.zip_with(qv, nv, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda v: F.sqrt(
        F.aggregate(
            F.transform(v, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return F.round(dot / (nrm(qv) * nrm(nv)), 6)


def _topk(corpus: DataFrame, queries: DataFrame, qv_col: str) -> DataFrame:
    scored = corpus.join(
        F.broadcast(queries), F.col("q_id") != F.col("n_id")
    ).select("q_id", "n_id", _cos(F.col(qv_col), F.col("nv")).alias("sim"))
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select("q_id", "n_id", "rank", "sim")
    )


def rocchio_frame(emb: DataFrame) -> DataFrame:
    """Frame core of sim_rocchio_feedback (scaling-probe entry)."""
    c = emb.select(
        F.col("vec_id").alias("n_id"), _quant("embedding").alias("nv")
    )
    q0 = emb.filter(F.col("vec_id") < _N_Q).select(
        F.col("vec_id").alias("q_id"), _quant("embedding").alias("qv")
    )
    initial = _topk(c, q0, "qv")
    # element-wise exact integer sum of the top-10 neighbor vectors
    cent = (
        initial.join(c, "n_id")
        .select("q_id", F.posexplode("nv").alias("pos", "val"))
        .groupBy("q_id", "pos")
        .agg(F.sum("val").alias("s"))
    )
    qpos = q0.select("q_id", F.posexplode("qv").alias("pos", "qval"))
    q1 = (
        qpos.join(cent, ["q_id", "pos"])
        .select(
            "q_id",
            "pos",
            (F.lit(40.0) * F.col("qval") + F.lit(3.0) * F.col("s")).alias(
                "uval"
            ),
        )
        .groupBy("q_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "uval"))),
                lambda st: st["uval"],
            ).alias("uv")
        )
    )
    second = _topk(c, q1, "uv")
    flagged = second.join(
        initial.select("q_id", "n_id").withColumn("in_initial", F.lit(True)),
        ["q_id", "n_id"],
        "left",
    ).select(
        "q_id",
        "rank",
        "n_id",
        "sim",
        F.coalesce("in_initial", F.lit(False)).alias("in_initial"),
    )
    return flagged.select(
        "*",
        F.expr(
            "CAST(sum(CASE WHEN in_initial THEN 1 ELSE 0 END)"
            " OVER (PARTITION BY q_id) AS BIGINT)"
        ).alias("overlap_at_10"),
    ).orderBy("q_id", "rank")


_SQL_QV67 = (
    "list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000000))"
)
_SQL_COS = (
    "round(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))), 6)"
)


@query(
    "sim_rocchio_feedback",
    oracle=f"""
    WITH c AS (SELECT vec_id AS n_id, {_SQL_QV67} AS nv FROM embeddings),
    q0 AS (SELECT vec_id AS q_id, {_SQL_QV67} AS qv FROM embeddings
           WHERE vec_id < {_N_Q}),
    s0 AS (
      SELECT q_id, n_id,
             {_SQL_COS.format(a="qv", b="nv")} AS sim
      FROM q0 JOIN c ON q_id <> n_id
    ),
    initial AS (
      SELECT q_id, n_id, sim,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY sim DESC, n_id) AS INTEGER) AS rank
      FROM s0 QUALIFY rank <= {_K}
    ),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS pos),
    cent AS (
      SELECT i.q_id, d.pos, sum(c.nv[d.pos]) AS s
      FROM initial i JOIN c ON i.n_id = c.n_id CROSS JOIN dims d
      GROUP BY i.q_id, d.pos
    ),
    q1 AS (
      SELECT q0.q_id,
             list(40.0 * q0.qv[cent.pos] + 3.0 * cent.s
                  ORDER BY cent.pos) AS uv
      FROM q0 JOIN cent ON q0.q_id = cent.q_id
      GROUP BY q0.q_id
    ),
    s1 AS (
      SELECT q_id, n_id,
             {_SQL_COS.format(a="uv", b="nv")} AS sim
      FROM q1 JOIN c ON q_id <> n_id
    ),
    second AS (
      SELECT q_id, n_id, sim,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY sim DESC, n_id) AS INTEGER) AS rank
      FROM s1 QUALIFY rank <= {_K}
    ),
    flagged AS (
      SELECT s.q_id, s.rank, s.n_id, s.sim,
             coalesce(i.n_id IS NOT NULL, FALSE) AS in_initial
      FROM second s
      LEFT JOIN initial i ON s.q_id = i.q_id AND s.n_id = i.n_id
    )
    SELECT q_id, rank, n_id, sim, in_initial,
           CAST(sum(CASE WHEN in_initial THEN 1 ELSE 0 END)
                OVER (PARTITION BY q_id) AS BIGINT) AS overlap_at_10
    FROM flagged ORDER BY q_id, rank
    """,
)
def sim_rocchio_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback over the embedding corpus:
    top-10 cosine retrieval for the five query vectors, an
    integer-exact query update toward the retrieved centroid
    (alpha 1 / beta 0.75 via weights 40/3 on the sum), re-retrieval,
    and the per-query overlap between the two lists."""
    return rocchio_frame(table(spark, sf_dir, "embeddings"))
