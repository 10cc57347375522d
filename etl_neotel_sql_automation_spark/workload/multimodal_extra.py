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
