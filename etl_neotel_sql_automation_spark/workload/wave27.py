"""Round-6 wave-27 workloads: contrastive training pairs and robust
smoothing — train_contrastive_pairs (the data-prep step an embedding
model trains on: for each anchor document, one positive from the same
source and one hash-matched negative from a different source, built
deterministically with windows — no sampling randomness to reproduce),
and timeseries_rolling_median (the 7-day sliding MEDIAN of daily
revenue beside the mean trend the seasonal decomposition uses: one
outlier day drags a mean for a week but leaves the median fixed).

Determinism rules (house style): pair selection is pure window
arithmetic over (source, doc_id) and hash orderings — a fixed function
of the corpus; the rolling median is the exact lower median of each
7-element frame (sorted array element, no interpolation), in exact
cents.

Scale notes: pair construction is two partitioned windows (source-
keyed, then hash-ring-keyed) — no self-join, no skew; the rolling
median's collect window holds <= 7 elements per row over the bounded
day support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table

# ---------------------------------------------------------------------------
# train_contrastive_pairs — per anchor: positive = the NEXT doc of the
# same source in doc_id order (wrapping to the source's first doc so
# every doc in a >=2-doc source anchors exactly one pair); negative =
# the next doc in md5-ring order whose source differs (skipping
# same-source neighbors deterministically via a 2-step lookahead —
# enough on this corpus, and the miss case is emitted as NULL with a
# flag rather than silently dropped).
# ---------------------------------------------------------------------------


@query(
    "train_contrastive_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    pos AS (
      SELECT doc_id, source,
             coalesce(lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id),
                      first_value(doc_id) OVER (PARTITION BY source
                                                ORDER BY doc_id
                                                ROWS BETWEEN UNBOUNDED
                                                PRECEDING AND UNBOUNDED
                                                FOLLOWING)) AS pos_id,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS src_n
      FROM d
    ),
    ring AS (
      SELECT doc_id, source,
             lead(doc_id, 1) OVER (ORDER BY h, doc_id) AS n1_id,
             lead(source, 1) OVER (ORDER BY h, doc_id) AS n1_src,
             lead(doc_id, 2) OVER (ORDER BY h, doc_id) AS n2_id,
             lead(source, 2) OVER (ORDER BY h, doc_id) AS n2_src
      FROM d
    ),
    neg AS (
      SELECT doc_id,
             CASE WHEN n1_src IS NOT NULL AND n1_src <> source THEN n1_id
                  WHEN n2_src IS NOT NULL AND n2_src <> source THEN n2_id
                  END AS neg_id
      FROM ring
    )
    SELECT pos.doc_id AS anchor_id, pos.pos_id, neg.neg_id,
           CASE WHEN neg.neg_id IS NULL THEN 1 ELSE 0 END AS neg_miss
    FROM pos JOIN neg ON pos.doc_id = neg.doc_id
    WHERE pos.src_n >= 2 AND pos.pos_id <> pos.doc_id
    ORDER BY anchor_id
    """,
)
def train_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive pairs: same-source positive (next doc
    in id order, wrapping) and different-source negative (next on the
    md5 ring, 2-step lookahead)."""
    return contrastive_pairs_frame(table(spark, sf_dir, "documents"))


def contrastive_pairs_frame(docs: DataFrame) -> DataFrame:
    """Frame core of train_contrastive_pairs (scaling-probe entry)."""
    d = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    ws = W.partitionBy("source").orderBy("doc_id")
    ws_all = ws.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    pos = d.select(
        "doc_id",
        "source",
        F.coalesce(
            F.lead("doc_id").over(ws), F.first("doc_id").over(ws_all)
        ).alias("pos_id"),
        F.count("*").over(W.partitionBy("source")).cast("bigint").alias(
            "src_n"
        ),
    )
    wr = W.orderBy("h", "doc_id")
    ring = d.select(
        "doc_id",
        "source",
        F.lead("doc_id", 1).over(wr).alias("n1_id"),
        F.lead("source", 1).over(wr).alias("n1_src"),
        F.lead("doc_id", 2).over(wr).alias("n2_id"),
        F.lead("source", 2).over(wr).alias("n2_src"),
    )
    neg = ring.select(
        "doc_id",
        F.when(
            F.col("n1_src").isNotNull() & (F.col("n1_src") != F.col("source")),
            F.col("n1_id"),
        )
        .when(
            F.col("n2_src").isNotNull() & (F.col("n2_src") != F.col("source")),
            F.col("n2_id"),
        )
        .alias("neg_id"),
    )
    return (
        pos.join(neg, "doc_id")
        .filter((F.col("src_n") >= 2) & (F.col("pos_id") != F.col("doc_id")))
        .select(
            F.col("doc_id").alias("anchor_id"),
            "pos_id",
            "neg_id",
            F.when(F.col("neg_id").isNull(), 1).otherwise(0).alias("neg_miss"),
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# timeseries_rolling_median — exact 7-day sliding lower median of
# daily revenue (cents): sort the <= 7-element frame, take element
# ceil(n/2). Interior days only (full frames), beside the mean-based
# trend so the two smoothers are directly comparable.
# ---------------------------------------------------------------------------


@query(
    "timeseries_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    fr AS (
      SELECT day, rev,
             list_sort(list(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                       AND 3 FOLLOWING)) AS frame,
             CAST(count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                 AND 3 FOLLOWING) AS BIGINT) AS w_n
      FROM daily
    )
    SELECT day, rev,
           CAST(frame[4] AS BIGINT) AS median7_cents,
           CAST(list_aggregate(frame, 'sum') // 7 AS BIGINT) AS mean7_cents
    FROM fr WHERE w_n = 7 ORDER BY day
    """,
)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling median (and floor mean) of daily revenue in
    cents, interior days only."""
    return rolling_median_frame(table(spark, sf_dir, "orders"))


def rolling_median_frame(orders: DataFrame) -> DataFrame:
    """Frame core of timeseries_rolling_median (scaling-probe entry)."""
    daily = (
        orders.select(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    fr = daily.select(
        "day",
        "rev",
        F.sort_array(F.collect_list("rev").over(w)).alias("frame"),
        F.count("*").over(w).cast("bigint").alias("w_n"),
    )
    return (
        fr.filter(F.col("w_n") == 7)
        .select(
            "day",
            "rev",
            F.expr("CAST(frame[3] AS BIGINT)").alias("median7_cents"),
            F.expr(
                "CAST(aggregate(frame, CAST(0 AS BIGINT), (s, x) -> s + x)"
                " div 7 AS BIGINT)"
            ).alias("mean7_cents"),
        )
        .orderBy("day")
    )
