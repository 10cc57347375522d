"""LLM-data-pipeline workloads over ``documents`` / ``embeddings``:
dedup (exact, fingerprint, Jaccard, MinHash-LSH, SimHash), text
analysis, similarity search.

SQL-expressible ops carry DuckDB oracles; MinHash/SimHash/LSH rely on
Spark's xxhash64 and are registered rows-only (the driver records the
weaker check; Jaccard provides the differential ground truth for the
near-dup surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops import dedup as D
from ..ops import similarity as S
from ..ops import text as X
from . import query, table

# DuckDB token list mirroring ops.text.tokens
_SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY text
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.exact_groups(docs).select("keep_id", "n_dups")


@query(
    "dedup_fingerprint_docs",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def dedup_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.fingerprint_groups(table(spark, sf_dir, "documents"))


@query(
    "dedup_token_jaccard",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS id, source AS blk, unnest(list_distinct({_SQL_TOKS})) AS tok
      FROM documents
    ),
    sizes AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.blk = b.blk AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.id
    JOIN sizes sb ON id_b = sb.id
    """,
)
def dedup_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.token_jaccard_pairs(table(spark, sf_dir, "documents"))


@query("dedup_minhash_candidates")  # xxhash64-based: rows-only check
def dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_candidates(table(spark, sf_dir, "documents"))


@query("dedup_simhash")  # xxhash64-based: rows-only check
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(table(spark, sf_dir, "documents"))


_SQL_STOPS = "('" + "','".join(X.STOPWORDS) + "')"
_SQL_NTOK = f"len({_SQL_TOKS})"
_SQL_NSTOP = f"len(list_filter({_SQL_TOKS}, x -> lower(x) IN {_SQL_STOPS}))"
_SQL_PUNCT = (
    "CASE WHEN length(text) > 0 THEN "
    "CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)"
    " / length(text) ELSE 0.0 END"
)


def _sql_markers(lang: str) -> str:
    return "('" + "','".join(X.LANG_MARKERS[lang]) + "')"


@query(
    "text_analyze_docs",
    oracle=f"""
    SELECT doc_id,
           CAST({_SQL_NTOK} AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{X.BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars,
           round(CASE WHEN {_SQL_NTOK} > 0
                      THEN {_SQL_NSTOP} / {_SQL_NTOK} ELSE 0.0 END, 6) AS stopword_ratio,
           round({_SQL_PUNCT}, 6) AS punct_ratio,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def text_analyze_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.bpe_token_count("text").alias("n_bpe_tokens"),
        F.length("text").cast("int").alias("n_chars"),
        F.round(X.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        X.fingerprint_md5("text").alias("fingerprint"),
    )


@query(
    "text_langid_docs",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter({_SQL_TOKS}, x -> lower(x) IN {_sql_markers("en")})) AS s_en,
             len(list_filter({_SQL_TOKS}, x -> lower(x) IN {_sql_markers("es")})) AS s_es,
             len(list_filter({_SQL_TOKS}, x -> lower(x) IN {_sql_markers("fr")})) AS s_fr,
             len(list_filter({_SQL_TOKS}, x -> lower(x) IN {_sql_markers("de")})) AS s_de
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'en'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                ELSE 'de' END AS lang_pred
    FROM scored
    """,
)
def text_langid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.lang_id("text").alias("lang_pred"))


@query(
    "sim_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
    scored AS (
      SELECT q_id, n_id, round(list_cosine_similarity(qv, nv), 6) AS sim
      FROM q JOIN c ON q_id <> n_id
    ),
    ranked AS (
      SELECT q_id, n_id, sim,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
                  AS INTEGER) AS rank
      FROM scored
    )
    SELECT q_id, n_id, rank, sim FROM ranked WHERE rank <= 5
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query("sim_lsh_topk")  # ANN: recall < 1 by design; rows-only check
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, planes=4)


@query("sim_ivf_topk")  # ANN (k-means quantizer): rows-only check
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "agg_approx_stats",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           TRUE AS distinct_ok, TRUE AS p50_ok, TRUE AS p95_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale variants of distinct-count and percentile
    (HyperLogLog++ and the GK sketch) under a *derived-property*
    oracle: the sketch estimates themselves are engine-specific, so the
    compared output carries booleans asserting the estimates' accuracy
    bounds (HLL++ within ±10% of exact; approx_percentile inside the
    exact p45..p55 / p90..p99 value envelope — GK rank error at default
    accuracy is n/10000, far tighter). DuckDB reproduces the booleans
    as TRUE, giving the driver a real differential gate on the sketch
    without comparing approximations across engines."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("l_orderkey").alias("ad"),
            F.countDistinct("l_orderkey").alias("ed"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("ap50"),
            F.expr("approx_percentile(l_extendedprice, 0.95)").alias("ap95"),
            F.expr("percentile(l_extendedprice, 0.45)").alias("e45"),
            F.expr("percentile(l_extendedprice, 0.55)").alias("e55"),
            F.expr("percentile(l_extendedprice, 0.90)").alias("e90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("e99"),
        )
        .select(
            "l_returnflag",
            "n",
            (F.abs(F.col("ad") - F.col("ed")) <= F.col("ed") * 0.1).alias("distinct_ok"),
            F.col("ap50").between(F.col("e45"), F.col("e55")).alias("p50_ok"),
            F.col("ap95").between(F.col("e90"), F.col("e99")).alias("p95_ok"),
        )
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: the fifth dedup modality (exact,
    fingerprint, Jaccard, MinHash, embedding)."""
    return S.cosine_near_dup_pairs(table(spark, sf_dir, "embeddings"), threshold=0.35)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
           CAST(ascii(substr(text, 1, 1)) % 480 AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through the real mapInPandas
    plumbing (Arrow-batched Pandas UDF over opaque bytes). The oracle
    recomputes the deterministic fake-decoder features from the text the
    bytes were derived from. checksum (crc32) is not SQL-expressible in
    DuckDB and is dropped from the compared projection."""
    from ..ops import multimodal as M

    docs = table(spark, sf_dir, "documents")
    feats = M.extract_features(M.attach_binary(docs))
    return feats.select("doc_id", "n_bytes", "width", "height")


@query(
    "streaming_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Structured Streaming query (file source -> watermark ->
    tumbling window -> memory sink, availableNow) whose final result
    must equal the batch tumbling-window SQL."""
    from ..streaming.landing import stream_events_hourly

    return stream_events_hourly(spark, sf_dir)
