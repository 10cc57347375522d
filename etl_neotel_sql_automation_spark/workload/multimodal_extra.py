"""Multimodal wave 2: the remaining binary-column plumbing registered
as driver-checked queries — video-style frame sampling and the
``mapInArrow`` zero-copy feature-extraction flavor.

Both run over the deterministic fake-media column (text bytes; the
container ships no image/audio codecs — the decode step is the stub,
the Spark plumbing is real, per the build contract). The corpus is
printable ASCII (asserted against all three testdata scale factors),
so byte slices equal character slices and DuckDB can replay frame
boundaries and digests exactly with ``substr``/``md5``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

_FRAME = 64
_EVERY = 4


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(len(text) / {_FRAME}.0) AS BIGINT))) AS i
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(octet_length(encode(substr(text, CAST(i * {_FRAME} + 1 AS INTEGER),
                                    {_FRAME}))) AS INTEGER) AS n_bytes,
           md5(substr(text, CAST(i * {_FRAME} + 1 AS INTEGER), {_FRAME}))
             AS frame_md5
    FROM f WHERE i % {_EVERY} = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over an opaque binary column: slice
    each payload into fixed 64-byte frames and keep every
    4th — the decode-free skeleton of keyframe extraction, run
    through the REAL ``mapInPandas`` plumbing (Arrow binary batches,
    bytes never on the driver). The compared projection carries each
    kept frame's byte length and md5 digest, so the oracle verifies the
    exact frame boundaries and frame bytes, not just counts.

    Scale shape: embarrassingly parallel map over payload partitions —
    no shuffle, no driver collection; output rows ~ payload_bytes / 256, the same explode bound as a real
    frame-sampler. A real codec replaces the slicer; schema, batching
    and partitioning stay unchanged (ops/multimodal.py:sample_frames).
    """
    from ..ops import multimodal as M

    docs = table(spark, sf_dir, "documents")
    frames = M.sample_frames(
        M.attach_binary(docs), frame_size=_FRAME, every_nth=_EVERY
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("int").alias("n_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


@query(
    "multimodal_features_arrow",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
           CAST(ascii(substr(text, 1, 1)) % 480 AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``mapInArrow`` flavor of binary feature extraction — same
    deterministic fake-decoder features as ``multimodal_features`` (and
    the same oracle), but computed on raw ``pyarrow.RecordBatch``es
    with Arrow compute kernels, skipping the Arrow->pandas->Arrow
    conversion that ``mapInPandas`` pays per batch. Registering both
    flavors keeps the cheaper zero-copy path differentially checked,
    not just unit-tested (ops/multimodal.py:extract_features_arrow)."""
    from ..ops import multimodal as M

    docs = table(spark, sf_dir, "documents")
    feats = M.extract_features_arrow(M.attach_binary(docs))
    return feats.select("doc_id", "n_bytes", "width", "height")


@query(
    "cogroup_user_reconcile",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(epoch_us(ts)) AS BIGINT) AS first_event_us
      FROM events GROUP BY user_id
    ),
    o AS (
      SELECT o_custkey AS user_id, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS first_order_us
      FROM orders GROUP BY o_custkey
    )
    SELECT coalesce(e.user_id, o.user_id) AS user_id,
           coalesce(e.n_events, 0) AS n_events,
           coalesce(o.n_orders, 0) AS n_orders,
           e.first_event_us,
           o.first_order_us
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
)
def cogroup_user_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED Arrow UDF surface (the remaining pandas-API member
    after applyInPandas / mapInPandas / mapInArrow /
    applyInPandasWithState): events and orders cogrouped per user and
    reconciled in one pandas function — the imperative escape hatch
    for per-key logic that needs BOTH sides materialized together
    (full-outer semantics included: a key missing on one side arrives
    as an empty frame). The function emits only exact integers
    (counts + min epoch-micros), so the differential oracle — a plain
    full-outer aggregate join — compares bit-for-bit; the VALUE here
    is pinning the cogroup plumbing (key handling, empty frames,
    Arrow batches) against relational semantics.

    Scale shape: one shuffle per side keyed on the user id, Arrow
    batches per key group — the same cost as the equivalent join, with
    per-key Python only where per-key imperative logic demands it.
    """
    import pandas as pd

    from pyspark.sql import types as T

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ous"),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("n_orders", T.LongType()),
            T.StructField("first_event_us", T.LongType()),
            T.StructField("first_order_us", T.LongType()),
        ]
    )

    def reconcile(key, epdf: pd.DataFrame, opdf: pd.DataFrame) -> pd.DataFrame:
        (uid,) = key
        return pd.DataFrame(
            [
                [
                    uid,
                    len(epdf),
                    len(opdf),
                    int(epdf["us"].min()) if len(epdf) else None,
                    int(opdf["ous"].min()) if len(opdf) else None,
                ]
            ],
            columns=[f.name for f in schema.fields],
        )

    return (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(reconcile, schema)
    )
