"""Round-6 wave-23 workloads: binary-embedding retrieval, steady-state
behavior, and the streaming SPC twin — sign-bit Hamming top-k (the
third quantization family member beside SQ8 and PQ: 64 float dims
become two 32-bit words, distance becomes two popcounts — the
cheapest retrieval path that exists at 100 TB), the stationary
distribution of the event-type Markov chain (events_markov_transitions
gives the matrix; this gives where the chain SETTLES — exact integer
power iteration, the pagerank_int discipline on a state-bounded
matrix), and the streaming twin of the wave-21 p-chart (weekly
return-rate state maintained by a real streaming aggregation, control
limits applied display-side — equals the batch chart row-for-row,
same oracle verbatim).

Determinism rules (house style): sign bits pack into 32-bit words
(bit 63 overflows DuckDB's left shift — verified — and 32-bit words
sidestep two's-complement corner cases entirely); Hamming top-k
carries a (distance, neighbor id) tiebreak; the stationary vector is
scaled 1e12 with per-source floor division each iteration.

Scale notes: binary retrieval scans corpus x queries with the query
side literally bounded (5 vectors) and explicitly broadcast — the
unhinted cross join planned as a CartesianProduct that re-read the
corpus once per partition pair (measured at the 100x probe);
the Markov machinery is state-bounded (~6 rows) after one
transition-count aggregate; the streaming chart's state is one row
per week.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# emb_binary_hamming_topk — binarize (x_d > 0) into 2x32-bit words,
# Hamming top-10 for the 5 query vectors (vec_id < 5) over the rest.
# ---------------------------------------------------------------------------

_BH_QUERIES = 5
_BH_K = 10

_SQL_PACK = """
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
    "emb_binary_hamming_topk",
    oracle=f"""
    WITH packed AS ({_SQL_PACK}),
    q AS (SELECT vec_id AS qid, w1 AS q1, w2 AS q2 FROM packed
          WHERE vec_id < {_BH_QUERIES}),
    c AS (SELECT * FROM packed WHERE vec_id >= {_BH_QUERIES}),
    d AS (
      SELECT q.qid, c.vec_id AS neighbor,
             CAST(bit_count(xor(q.q1, c.w1)) + bit_count(xor(q.q2, c.w2))
                  AS BIGINT) AS hamming
      FROM q CROSS JOIN c
    ),
    r AS (
      SELECT qid, neighbor, hamming,
             row_number() OVER (PARTITION BY qid
                                ORDER BY hamming, neighbor) AS rnk
      FROM d
    )
    SELECT qid, CAST(rnk AS INTEGER) AS rnk, neighbor, hamming
    FROM r WHERE rnk <= {_BH_K} ORDER BY qid, rnk
    """,
)
def emb_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit binary retrieval: Hamming top-10 neighbors for the
    first 5 vectors via two packed 32-bit words and popcounts."""
    return binary_hamming_frame(table(spark, sf_dir, "embeddings"))


def pack_sign_words(emb: DataFrame) -> DataFrame:
    """(vec_id, w1, w2): sign bits of the 64 components packed into
    two 32-bit words — as ONE generated unrolled projection (no
    explode, no shuffle; the posexplode+groupBy form re-aggregated
    384M rows at the 100x probe and was the dominant cost — the same
    HOF-vs-generated-SQL lesson the LSH builder recorded in r5).
    Semantics identical to the oracle's unnest+sum: bit d set iff
    component d > 0."""

    def word(lo: int) -> str:
        terms = [
            f"(CASE WHEN embedding[{lo + i}] > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(32)
        ]
        return "CAST(" + " + ".join(terms) + " AS BIGINT)"

    return emb.select(
        "vec_id",
        F.expr(word(0)).alias("w1"),
        F.expr(word(32)).alias("w2"),
    )


def binary_hamming_frame(emb: DataFrame) -> DataFrame:
    """Frame core of emb_binary_hamming_topk (scaling-probe entry)."""
    from pyspark.sql import Window as W

    packed = pack_sign_words(emb)
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
    # two-phase distributed top-k: a per-query window would sort the
    # WHOLE corpus in |queries| single tasks (measured 158 s at the
    # 100x probe on the rerank variant); bucketing by a neighbor hash
    # first parallelizes the heavy sort, and the global pass only sees
    # |buckets| * k survivors. Output is bit-identical: the global
    # top-k is a subset of the union of per-bucket top-k.
    salted = d.withColumn(
        "salt", F.pmod(F.xxhash64("neighbor"), F.lit(32))
    )
    wb = W.partitionBy("qid", "salt").orderBy("hamming", "neighbor")
    survivors = (
        salted.withColumn("brnk", F.row_number().over(wb))
        .filter(F.col("brnk") <= _BH_K)
        .drop("brnk", "salt")
    )
    w = W.partitionBy("qid").orderBy("hamming", "neighbor")
    return (
        survivors.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BH_K)
        .select("qid", F.col("rnk").cast("int").alias("rnk"), "neighbor",
                "hamming")
        .orderBy("qid", "rnk")
    )


# ---------------------------------------------------------------------------
# events_markov_stationary — where the event-type chain settles: 3
# exact integer power-iteration steps (scale 1e12, per-source floor
# division) from the uniform start over the per-user consecutive-type
# transition counts. States are the event-type domain (bounded), so
# every iteration is a ~6x6 join.
# ---------------------------------------------------------------------------

_MK_SCALE = 10**12
_MK_ITERS = 3


def _markov_oracle() -> str:
    head = f"""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS dst
      FROM events
    ),
    trans AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM trans GROUP BY src),
    states AS (SELECT DISTINCT src AS s FROM trans
               UNION SELECT DISTINCT dst FROM trans),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
    p0 AS (SELECT s, CAST({_MK_SCALE} // (SELECT k FROM ns) AS BIGINT) AS pi
           FROM states)
    """
    steps = []
    prev = "p0"
    for i in range(1, _MK_ITERS + 1):
        steps.append(f"""
    p{i} AS (
      SELECT trans.dst AS s,
             CAST(sum(({prev}.pi * trans.c) // tot.t) AS BIGINT) AS pi
      FROM trans JOIN {prev} ON trans.src = {prev}.s
                 JOIN tot ON trans.src = tot.src
      GROUP BY trans.dst
    )""")
        prev = f"p{i}"
    return (
        head + "," + ",".join(steps)
        + f"""
    SELECT states.s AS event_type,
           CAST(coalesce({prev}.pi, 0) AS BIGINT) AS pi_e12
    FROM states LEFT JOIN {prev} ON states.s = {prev}.s
    ORDER BY event_type
    """
    )


@query("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution (3 exact integer power-iteration steps,
    scale 1e12) of the per-user event-type transition chain."""
    return markov_stationary_frame(table(spark, sf_dir, "events"))


def markov_stationary_frame(ev: DataFrame) -> DataFrame:
    """Frame core of events_markov_stationary (scaling-probe entry)."""
    from pyspark.sql import Window as W

    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    )
    trans = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = trans.groupBy("src").agg(F.sum("c").cast("bigint").alias("t"))
    states = (
        trans.select(F.col("src").alias("s"))
        .union(trans.select(F.col("dst").alias("s")))
        .distinct()
    )
    ns = states.agg(F.count("*").cast("bigint").alias("k"))
    pi = states.crossJoin(F.broadcast(ns)).select(  # 1-row state count
        "s", F.expr(f"CAST({_MK_SCALE} div k AS BIGINT)").alias("pi")
    )
    tr = trans.join(tot, "src")
    for _ in range(_MK_ITERS):
        pi = (
            tr.join(pi, tr.src == pi.s)
            .select(
                F.col("dst").alias("s2"),
                F.expr("CAST((pi * c) div t AS BIGINT)").alias("contrib"),
            )
            .groupBy(F.col("s2").alias("s"))
            .agg(F.sum("contrib").cast("bigint").alias("pi"))
        )
    return (
        states.join(pi, "s", "left")
        .select(
            F.col("s").alias("event_type"),
            F.coalesce("pi", F.lit(0)).cast("bigint").alias("pi_e12"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# streaming_pchart_returns — the wave-21 p-chart as a REAL streaming
# aggregation: lineitem streams in (availableNow), weekly (n, r)
# counts are genuine streaming state in complete mode, and the pooled
# p-bar / 3-sigma limits are applied display-side on the emitted
# weekly table (exactly how a live SPC dashboard works: the stream
# maintains counts, the chart derives limits). Must equal
# quality_pchart_returns row-for-row — same oracle verbatim
# (conscious tripwire exclusion; the policy test is
# tests/test_wave23.py::test_streaming_pchart_equals_batch).
# ---------------------------------------------------------------------------

from .wave21 import PCHART_ORACLE  # noqa: E402


@query("streaming_pchart_returns", oracle=PCHART_ORACLE)
def streaming_pchart_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of streaming.landing.stream_pchart_returns:
    weekly return-rate SPC state maintained by a real streaming
    aggregation, limits applied display-side — checked against
    quality_pchart_returns' oracle verbatim."""
    from ..streaming.landing import stream_pchart_returns

    return stream_pchart_returns(spark, sf_dir)
