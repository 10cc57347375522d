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

    # Explicit keyed repartition on BOTH cogroup sides (the
    # zscore_outliers precedent, SCALING.md "AQE and Python-worker
    # stages"): AQE's byte-based coalescing collapses the small-by-
    # bytes shuffles and serializes every key group through a handful
    # of Python workers — byte size is blind to the per-key pandas
    # cost that dominates a cogroup. A user-numbered repartition is
    # AQE-exempt and its hash partitioning is exactly what
    # FlatMapCoGroupsInPandas requires, so no extra shuffle
    # (measured 12.3 s -> <6 s at sf0.1, r10 VERDICT #6).
    par = spark.sparkContext.defaultParallelism
    return (
        ev.repartition(par, "user_id")
        .groupBy("user_id")
        .cogroup(orders.repartition(par, "user_id").groupBy("user_id"))
        .applyInPandas(reconcile, schema)
    )


_AHASH_PX = 60      # 60 "pixels" -> 60-bit hash (the md5_long 60-bit family: stays positive in BIGINT)
_AHASH_BANDS = 4    # 15-bit bands for the candidate join
_AHASH_MAXH = 6     # Hamming radius for a near-dup verdict
# Fat-bucket skip (round 9): a 15-bit band value shared by more than
# this many payloads is non-discriminative (near-constant images — a
# 60-bit aHash has far less entropy than a 32-perm MinHash signature),
# and the self-join inside such a bucket is the quadratic failure mode
# the wave-73 probe caught (252 s at 10x on a homogeneous synthetic).
# Production banded-pHash ladders skip them; the quality and
# capture-recapture meters then MEASURE what the capped ladder misses.
# The cap is part of the operator's semantics: the oracles replay it.
_BUCKET_CAP = 64


def ahash_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, ahash) — the 60-bit average-hash per binary payload,
    computed inside the real mapInPandas decode plumbing (each of the
    first 60 bytes becomes a bit by comparing against the payload mean,
    cross-multiplied so there is no division). Shared by the near-dup
    query, the banding-recall quality meter, and the pHash
    capture–recapture audit (wave73)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T
    from ..ops import multimodal as M

    media = M.attach_binary(docs.filter(F.length("text") >= _AHASH_PX)).select(
        "doc_id", "media"
    )
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("ahash", T.LongType())]
    )

    def ahash_batches(batches):
        for pdf in batches:
            hashes = []
            for b in pdf["media"]:
                px = np.frombuffer(bytes(b)[:_AHASH_PX], dtype=np.uint8).astype(np.int64)
                s = int(px.sum())
                bits = (px * _AHASH_PX) >= s
                hashes.append(int((np.left_shift(1, np.arange(_AHASH_PX))[bits]).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "ahash": hashes})

    return media.mapInPandas(ahash_batches, out_schema)


# DuckDB replay of ahash_frame over the printable-ASCII corpus: the
# byte-level pixel math from the text the payload encodes.
SQL_AHASH = f"""
    WITH base AS (
      SELECT doc_id,
             list_transform(range(1, {_AHASH_PX} + 1),
                            i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS px
      FROM documents WHERE length(text) >= {_AHASH_PX}
    ),
    h AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(1, {_AHASH_PX} + 1),
                   i -> CASE WHEN px[i] * {_AHASH_PX} >= list_sum(px)
                             THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT) AS ahash
      FROM base
    )
"""

# DuckDB replay of banded_candidate_occurrences (composes after
# SQL_AHASH's `h` CTE): per-band bucket occupancy, the fat-bucket
# skip, and the per-(pair, band) candidate occurrences.
SQL_BANDED_CAND = f""",
    bands AS (
      SELECT doc_id, ahash, unnest(range(0, {_AHASH_BANDS})) AS k FROM h
    ),
    kb AS (
      SELECT doc_id, ahash, k,
             (ahash >> (15 * CAST(k AS INTEGER))) & 32767 AS band
      FROM bands
    ),
    occ AS (SELECT k, band, count(*) AS occ_n FROM kb GROUP BY k, band),
    slim AS (
      SELECT kb.doc_id, kb.ahash, kb.k, kb.band
      FROM kb JOIN occ USING (k, band) WHERE occ_n <= {_BUCKET_CAP}
    ),
    cand_k AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.ahash AS ha, b.ahash AS hb, a.k AS k
      FROM slim a JOIN slim b
        ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
    )
"""


def banded_candidate_occurrences(h: DataFrame) -> DataFrame:
    """(id_a, id_b, ha, hb, k) — one row per candidate pair per
    colliding band, from the fat-bucket-capped banded self-join over
    the aHash frame. The occupancy table is bounded by construction
    (at most _AHASH_BANDS=4 x 2^15 rows); buckets over ``_BUCKET_CAP`` are
    skipped — the deployed pHash-LSH ladder, whose achieved recall the
    wave-73 quality and capture-recapture meters measure.

    The hash frame is localCheckpointed ONCE here: the mapInPandas
    decode pass otherwise recomputes for every consumer (occupancy,
    both join sides — the 62 -> 7 s lesson at the 100x probe), and at
    deploy scale re-decoding payloads is the single most expensive
    thing a ladder can do twice."""
    h = h.localCheckpoint()
    kb = h.select(
        "doc_id",
        "ahash",
        F.explode(F.sequence(F.lit(0), F.lit(_AHASH_BANDS - 1))).alias("k"),
    ).withColumn("band", F.expr("shiftright(ahash, 15 * k) & 32767"))
    occ = kb.groupBy("k", "band").agg(F.count("*").alias("occ_n"))
    slim = (
        kb.join(occ, ["k", "band"])
        .filter(F.col("occ_n") <= _BUCKET_CAP)
        .select("doc_id", "ahash", "k", "band")
    )
    a = slim.select(
        F.col("doc_id").alias("id_a"), F.col("ahash").alias("ha"),
        F.col("k"), F.col("band"),
    )
    b = slim.select(
        F.col("doc_id").alias("id_b"), F.col("ahash").alias("hb"),
        F.col("k"), F.col("band"),
    )
    return (
        a.join(b, ["k", "band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb", "k")
    )


@query(
    "multimodal_phash_neardup",
    oracle=SQL_AHASH
    + SQL_BANDED_CAND
    + f"""
    SELECT DISTINCT id_a, id_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand_k
    WHERE bit_count(xor(ha, hb)) <= {_AHASH_MAXH}
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the BINARY media
    column — the image-dedup modality: an average-hash (aHash) per
    payload computed inside the real mapInPandas decode plumbing
    (each of the first 60 bytes becomes a bit by comparing against
    the payload mean — cross-multiplied, no division), then
    SimHash-style 15-bit band candidate joins and a Hamming-radius
    verdict. Exact copies collide at distance 0; near copies land
    within the radius. The oracle replays the byte-level pixel math
    from the text the payload encodes (the corpus is printable
    ASCII — the multimodal_frame_sample precedent), so the whole
    modality — Python decode included — is differentially checked.

    Scale shape: hashes are one mapInPandas pass (payload bytes never
    leave the executors), the candidate join is the banded-LSH
    equi-join (never all-pairs) with the fat-bucket skip
    (occupancy > _BUCKET_CAP=64 bands carry no discrimination and are the
    quadratic failure mode — the wave-73 probe evidence), and the
    Hamming check is one codegen'd bit_count per candidate. The 60-bit
    width keeps hashes positive in BIGINT on both engines
    (the ops/hashing.py rule).
    """
    h = ahash_frame(table(spark, sf_dir, "documents"))
    cand = banded_candidate_occurrences(h).select(
        "id_a", "id_b", "ha", "hb"
    ).distinct()
    return cand.select(
        "id_a",
        "id_b",
        F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)").alias("hamming"),
    ).filter(F.col("hamming") <= _AHASH_MAXH)


# ---------------------------------------------------------------------------
# multimodal_codec_roundtrip — the REAL-codec decode path, oracle-paired
# (r9 VERDICT #3): every prior multimodal entry decodes fake printable-
# ASCII payloads; this one synthesizes a genuine PNG and a genuine
# 16-bit PCM WAV per document inside the mapInPandas pass (stdlib
# struct+zlib — bytes a real decoder accepts) and decodes them with the
# real parsers (ops/multimodal.py png_decode: signature + IHDR + chunk
# CRC; wav_meta: RIFF chunk walk). The emitted dimensions/meta derive
# from doc_id and text length by construction, so DuckDB replays them
# arithmetically — a differential check that the DECODERS, not just the
# plumbing, read the formats correctly (a wrong-endian IHDR parse or a
# misplaced fmt offset flips every row).
#
# Scale shape: ONE mapInPandas pass, one output row per document, no
# shuffle — encode and decode never leave the executor, payload bytes
# never ship anywhere.
# ---------------------------------------------------------------------------


def codec_roundtrip_frame(docs: DataFrame) -> DataFrame:
    """Frame core of multimodal_codec_roundtrip (scaling-probe entry)."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..ops import multimodal as M

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("png_width", T.IntegerType()),
            T.StructField("png_height", T.IntegerType()),
            T.StructField("wav_sample_rate", T.IntegerType()),
            T.StructField("wav_n_samples", T.IntegerType()),
            T.StructField("wav_n_bytes", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                png = M.make_png(1 + rid % 16, 1 + len(t) % 16)
                feat = M.png_decode(png)  # raises on any malformed byte
                n_samp = 1 + len(t) % 256
                meta = M.wav_meta(M.make_wav(n_samp))
                rows.append(
                    (
                        rid,
                        feat["width"],
                        feat["height"],
                        meta["sample_rate"],
                        meta["n_samples"],
                        meta["n_bytes"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "png_width", "png_height",
                    "wav_sample_rate", "wav_n_samples", "wav_n_bytes",
                ],
            )

    return (
        docs.select("doc_id", "text").mapInPandas(run, out_schema).orderBy("doc_id")
    )


@query(
    "multimodal_codec_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 16 AS INTEGER) AS png_width,
           CAST(1 + length(coalesce(text, '')) % 16 AS INTEGER) AS png_height,
           CAST(8000 AS INTEGER) AS wav_sample_rate,
           CAST(1 + length(coalesce(text, '')) % 256 AS INTEGER)
             AS wav_n_samples,
           CAST(44 + 2 * (1 + length(coalesce(text, '')) % 256) AS BIGINT)
             AS wav_n_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec roundtrip: per document, synthesize a genuine PNG
    (dims derived from doc_id/text length) and a genuine PCM WAV, then
    decode both with the real stdlib parsers (PNG signature/IHDR/CRC;
    WAV RIFF chunk walk) inside one mapInPandas pass. The oracle
    replays the derived dimensions and the exact WAV byte size
    (44-byte header + 2 bytes/sample) arithmetically — a wrong parse
    anywhere flips rows."""
    return codec_roundtrip_frame(table(spark, sf_dir, "documents"))
