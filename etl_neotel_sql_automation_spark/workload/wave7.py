"""Round-6 wave-4 workloads: hybrid-retrieval reciprocal-rank fusion,
search-index posting-list construction, cross-source quantile score
normalization, and a k-anonymity privacy audit — the retrieval-serving
and data-governance passes that sit beside the curation pipeline.

Determinism rules (house style, see workload/__init__ docstring):
ranks and fused scores are exact integers (reciprocal ranks in parts
per billion via integer division); per-doc quality lands in ppm ints
before any cross-engine comparison; posting lists are rendered from
rank-sorted struct arrays so the same string forms under any
parallelism; every ORDER BY carries a full unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table
from ..ops import similarity as S
from ..ops import text as X
from .corpus_mining import BM25_SCORED_SQL, bm25_doc_scores
from .llm_ops import _SQL_QUALITY

_SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"

# ---------------------------------------------------------------------------
# sim_rrf_fusion — hybrid search: the lexical BM25 ranking and the
# dense cosine ranking fused by Reciprocal Rank Fusion
# (Cormack et al. 2009): rrf(d) = Σ_legs 1/(60 + rank_leg(d)).
# The standard way a RAG/search stack combines a sparse and a dense
# retriever without score calibration — only RANKS cross the fusion
# boundary, so the two legs' incomparable score scales never meet.
# Reciprocal ranks are integers in parts-per-billion (10^9 div
# (60 + rank)), so the fused score is exact and engine-replayable.
#
# Scale shape: each leg is its own bounded top-DEPTH (TakeOrdered /
# per-query window); the fusion joins two ≤DEPTH-row frames — a
# construction-bounded join at any corpus size. The dense query is a
# single probe vector (vec_id 0); the lexical query is the fixed BM25
# term set. documents and embeddings share the id space (vec_id ⊆
# doc_id on the driver's testdata), which is exactly the "dense
# vectors exist for a slice of the corpus" deployment — the full
# outer join keeps docs only one retriever can see.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 100
_RRF_PPB = 10**9


@query(
    "sim_rrf_fusion",
    oracle=f"""
    WITH lex0 AS ({BM25_SCORED_SQL}),
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                          AS INTEGER) AS lex_rank
      FROM lex0 QUALIFY lex_rank <= {_RRF_DEPTH}
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    dense0 AS (
      SELECT vec_id AS n_id, round(list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])), 6) AS sim
      FROM embeddings CROSS JOIN q WHERE vec_id <> 0
    ),
    dense AS (
      SELECT n_id, CAST(row_number() OVER (ORDER BY sim DESC, n_id)
                        AS INTEGER) AS dense_rank
      FROM dense0 QUALIFY dense_rank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, dense.n_id) AS doc_id, lex_rank, dense_rank,
             coalesce({_RRF_PPB} // (CAST({_RRF_K} AS BIGINT) + lex_rank), 0)
               + coalesce({_RRF_PPB} // (CAST({_RRF_K} AS BIGINT) + dense_rank), 0)
               AS rrf_ppb
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.n_id
    )
    SELECT doc_id, lex_rank, dense_rank, CAST(rrf_ppb AS BIGINT) AS rrf_ppb
    FROM fused
    ORDER BY rrf_ppb DESC, doc_id
    LIMIT 20
    """,
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hybrid-search results: BM25 top-100 and dense cosine
    top-100 (probe = vec_id 0) fused by integer reciprocal-rank
    fusion (k=60, ppb units). Each leg bounds itself before the
    fusion join — orderBy+limit is a distributed TakeOrdered, the
    rank window then runs over ≤100 rows — so the fusion never sees
    more than 2×DEPTH rows regardless of corpus size."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex_top = bm25_doc_scores(docs).orderBy(F.desc("score"), "doc_id").limit(_RRF_DEPTH)
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), "doc_id"))
        .cast("int")
        .alias("lex_rank"),
    )
    dense = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=_RRF_DEPTH
    ).select("n_id", F.col("rank").cast("int").alias("dense_rank"))
    rr = lambda c: F.coalesce(  # noqa: E731
        F.expr(f"{_RRF_PPB} div (CAST({_RRF_K} AS BIGINT) + {c})"), F.lit(0).cast("long")
    )
    return (
        lex.join(dense, lex.doc_id == dense.n_id, "full_outer")
        .select(
            F.coalesce(F.col("doc_id"), F.col("n_id")).alias("doc_id"),
            "lex_rank",
            "dense_rank",
            (rr("lex_rank") + rr("dense_rank")).cast("bigint").alias("rrf_ppb"),
        )
        .orderBy(F.desc("rrf_ppb"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# text_inverted_index — search-index construction: per-term document
# frequency, total term frequency, and a CAPPED posting list (top-5
# docs by tf). The build side of the BM25 family: what a distributed
# indexer materializes per shard before segment merge. The cap is the
# scale decision — uncapped posting lists make a single hot term a
# single giant row ("the" at 100 TB is a multi-GB posting); capping
# at k keeps every output row bounded while df/total_tf stay exact
# combinable aggregates. Postings render from rank-sorted struct
# arrays, so the string is parallelism-independent.
# ---------------------------------------------------------------------------

_INV_TOP_TERMS = 50
_INV_POSTINGS = 5


@query(
    "text_inverted_index",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
    tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY term, doc_id
    ),
    stats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY term
    ),
    ranked AS (
      SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS r
      FROM tf
    ),
    post AS (
      SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY r) AS postings
      FROM ranked WHERE r <= {_INV_POSTINGS} GROUP BY term
    )
    SELECT term, df, total_tf, postings
    FROM stats JOIN post USING (term)
    ORDER BY df DESC, term
    LIMIT {_INV_TOP_TERMS}
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 terms by document frequency with exact df/total_tf and
    the capped top-5 posting list per term. One (term, doc) aggregate
    feeds both legs: stats is a per-term combinable aggregate, the
    posting window partitions BY TERM (no global window), and the cap
    bounds row width before anything is collected."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    w = W.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    post = (
        tf.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _INV_POSTINGS)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("r", "doc_id"))),
                    lambda s: s["doc_id"].cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return (
        stats.join(post, "term")
        .select("term", "df", "total_tf", "postings")
        .orderBy(F.desc("df"), "term")
        .limit(_INV_TOP_TERMS)
    )


# ---------------------------------------------------------------------------
# quality_quantile_normalize — cross-source score calibration by
# quantile normalization (the microarray method): each source's i-th
# order statistic is replaced by the AVERAGE i-th order statistic
# across sources, so every source ends up with the same score
# distribution and a single global quality threshold treats sources
# fairly — the fix for "source A's scorer runs hot". Scores are ppm
# integers before normalization; the reference value at each rank is
# an integer mean (sum div count), so the whole map is exact.
#
# Scale shape: rank windows partition BY SOURCE (a source's documents
# co-locate; no global window), the reference distribution is one
# combinable per-rank aggregate, and the map-back is an equi-join on
# rank. With unequal source sizes the per-rank mean runs over the
# sources that reach that rank — the standard generalization (full
# interpolation would need a fractional-rank join; this form stays
# exact-integer).
# ---------------------------------------------------------------------------

_SQL_SCORE_PPM = f"CAST(round(round({_SQL_QUALITY}, 6) * 1000000e0) AS BIGINT)"


@query(
    "quality_quantile_normalize",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, {_SQL_SCORE_PPM} AS score_ppm FROM documents
    ),
    r AS (
      SELECT doc_id, source, score_ppm,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY score_ppm, doc_id) AS INTEGER) AS rnk
      FROM s
    ),
    ref AS (
      SELECT rnk, CAST(sum(score_ppm) // count(*) AS BIGINT) AS norm_ppm
      FROM r GROUP BY rnk
    )
    SELECT doc_id, source, score_ppm, rnk, norm_ppm
    FROM r JOIN ref USING (rnk)
    """,
)
def quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's quality score quantile-normalized across
    sources: within-source rank, per-rank integer mean over sources
    as the reference distribution, map-back by rank equi-join. The
    calibrated `norm_ppm` is what a single corpus-wide quality
    threshold should cut on."""
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        "source",
        (F.round(F.round(X.quality_score("text"), 6) * F.lit(1000000.0)))
        .cast("bigint")
        .alias("score_ppm"),
    )
    r = s.select(
        "*",
        F.row_number()
        .over(W.partitionBy("source").orderBy("score_ppm", "doc_id"))
        .cast("int")
        .alias("rnk"),
    )
    ref = r.groupBy("rnk").agg(
        F.expr("CAST(sum(score_ppm) div count(*) AS BIGINT)").alias("norm_ppm")
    )
    return r.join(ref, "rnk").select("doc_id", "source", "score_ppm", "rnk", "norm_ppm")


# ---------------------------------------------------------------------------
# privacy_k_anonymity — governance audit: group the customer table by
# a quasi-identifier triple (nation, segment, coarse balance band)
# and measure re-identification risk per nation: how many QI groups
# exist, how many are smaller than k=5, how many rows sit in those
# risky groups, and the minimum group size. The pre-release check a
# data-sharing pipeline runs before publishing "anonymized" extracts;
# rows_at_risk is what generalization/suppression must treat. Two
# combinable aggregates — QI group sizes, then per-nation rollup —
# shuffle on uniform keys at any scale.
# ---------------------------------------------------------------------------

_KANON_K = 5


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS k
      FROM customer
      GROUP BY c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000e0) AS BIGINT)
    )
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_groups,
           CAST(sum(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(min(k) AS BIGINT) AS min_k
    FROM g GROUP BY c_nationkey
    ORDER BY nationkey
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation k-anonymity readout over the (nation, segment,
    1000-unit balance band) quasi-identifier: group count, groups
    below k=5, rows those groups expose, and the worst (minimum)
    group size."""
    cust = table(spark, sf_dir, "customer")
    g = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.expr("CAST(floor(c_acctbal / 1000e0) AS BIGINT)").alias("band"),
    ).agg(F.count("*").alias("k"))
    return (
        g.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("k") < _KANON_K, 1).otherwise(0))
            .cast("bigint")
            .alias("n_risky_groups"),
            F.sum(F.when(F.col("k") < _KANON_K, F.col("k")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
            F.min("k").cast("bigint").alias("min_k"),
        )
        .orderBy("nationkey")
    )
