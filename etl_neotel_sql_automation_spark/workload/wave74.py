"""Round-9 wave-74 workloads: multimodal byte-level payload analytics
— the second parity push (after wave 73) for the binary media column.
An audio/image pipeline's pre-decode triage reads exactly these three
meters: payload entropy (constant vs text-like vs compressed/encrypted
bytes), clipping (samples pinned at the peak — the recording-chain
defect), and silence runs (constant-byte stretches — dead air / black
frames).

Plumbing vs math split (the scale design): the byte HISTOGRAM is
computed inside mapInPandas with numpy ``bincount`` — payload bytes
never leave the executors and the UDF emits at most 256 rows per
payload, so nothing corpus-scaled flows through Python row-at-a-time
or through a positional explode. The entropy logarithms then run
ENGINE-side on the bounded histogram (Spark codegen vs DuckDB ln over
the SAME integer-derived rationals, rounded to micro-nats per term —
the insights.py entropy recipe), so the oracle is bit-exact without
trusting a third libm. The silence-run meter emits pure INTEGER run
statistics from numpy (no float leaves Python at all); its oracle
replays runs with standard gaps-and-islands SQL over the
printable-ASCII corpus (the multimodal_frame_sample precedent: byte
== character).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import query, table

_RUN_MIN = 3  # a "silence" run = >= 3 identical consecutive bytes

# DuckDB replay of the per-payload byte histogram (byte == character on
# the printable-ASCII corpus).
_SQL_HIST = """
    WITH pos AS (
      SELECT doc_id,
             unnest(range(1, length(text) + 1)) AS i,
             text
      FROM documents
    ),
    hist AS (
      SELECT doc_id,
             CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT) AS byte,
             CAST(count(*) AS BIGINT) AS n
      FROM pos GROUP BY doc_id, 2
    )
"""


def byte_hist_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, byte, n) — per-payload byte histogram via mapInPandas
    + numpy bincount. Output bounded at 256 rows per payload whatever
    the payload size; bytes never reach the driver. Shared by the
    entropy and clipping meters (wave74)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T
    from ..ops import multimodal as M

    media = M.attach_binary(docs).select("doc_id", "media")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("byte", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def hist_batches(batches):
        for pdf in batches:
            ids, bts, cnts = [], [], []
            for rid, b in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                nz = np.nonzero(counts)[0]
                ids.extend([rid] * len(nz))
                bts.extend(nz.tolist())
                cnts.extend(counts[nz].tolist())
            yield pd.DataFrame({"doc_id": ids, "byte": bts, "n": cnts})

    return media.mapInPandas(hist_batches, out_schema)


# ---------------------------------------------------------------------------
# multimodal_byte_entropy — Shannon entropy of each payload's byte
# distribution in integer micro-nats: H = sum (n_i/N) ln(N/n_i),
# computed as the order-free BIGINT sum of n_i * round(ln(N/n_i)*1e6)
# floor-divided by N (every term non-negative; the insights.py
# event-entropy recipe verbatim). Low entropy flags constant/silent
# payloads, ~printable-text entropy sits midband, and the corpus's
# compressed/encrypted tail tops out — the triage a decode farm runs
# BEFORE spending decoder cycles.
#
# Scale shape: one mapInPandas histogram pass (<=256 rows/payload),
# a per-doc window over those bounded rows, one combinable aggregate.
# ---------------------------------------------------------------------------


def byte_entropy_frame(docs: DataFrame) -> DataFrame:
    """Frame core of multimodal_byte_entropy (scaling-probe entry)."""
    hist = byte_hist_frame(docs)
    w = W.partitionBy("doc_id")
    terms = hist.select(
        "doc_id",
        "n",
        F.sum("n").over(w).alias("nt"),
        F.count("*").over(w).alias("n_distinct"),
    ).select(
        "doc_id",
        "nt",
        "n_distinct",
        F.expr("n * CAST(round(ln(nt * 1.0e0 / n) * 1.0e6) AS BIGINT)").alias(
            "term"
        ),
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.max("nt").cast("bigint").alias("n_bytes"),
            F.max("n_distinct").cast("bigint").alias("n_distinct"),
            F.expr("CAST(sum(term) div max(nt) AS BIGINT)").alias(
                "entropy_micronat"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_byte_entropy",
    oracle=_SQL_HIST
    + """
    , terms AS (
      SELECT doc_id, n,
             sum(n) OVER (PARTITION BY doc_id) AS nt,
             count(*) OVER (PARTITION BY doc_id) AS n_distinct
      FROM hist
    )
    SELECT doc_id,
           CAST(max(nt) AS BIGINT) AS n_bytes,
           CAST(max(n_distinct) AS BIGINT) AS n_distinct,
           CAST(sum(n * CAST(round(ln(nt * 1.0e0 / n) * 1.0e6) AS BIGINT))
                // max(nt) AS BIGINT) AS entropy_micronat
    FROM terms
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload byte-distribution Shannon entropy in micro-nats
    (plus byte count and distinct-byte count) over the binary media
    column — the pre-decode triage separating constant/silent payloads
    from text-like and compressed/encrypted ones. Histogram via
    mapInPandas bincount (<=256 rows/payload); logarithms engine-side
    so the DuckDB replay is bit-exact."""
    return byte_entropy_frame(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal_clipping_rate — the audio-chain defect meter: what
# fraction of samples sit ON the payload's own peak (and floor)?
# A clean signal touches its extremes rarely; a clipped one pins
# there. Pure integer floor-div ppm off the bounded histogram.
# ---------------------------------------------------------------------------


def clipping_rate_frame(docs: DataFrame) -> DataFrame:
    """Frame core of multimodal_clipping_rate (scaling-probe entry)."""
    hist = byte_hist_frame(docs)
    return (
        hist.groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_bytes"),
            F.max("byte").cast("bigint").alias("peak_byte"),
            F.min("byte").cast("bigint").alias("floor_byte"),
            F.expr("max_by(n, byte)").cast("bigint").alias("n_peak"),
            F.expr("min_by(n, byte)").cast("bigint").alias("n_floor"),
        )
        .select(
            "doc_id",
            "n_bytes",
            "peak_byte",
            "floor_byte",
            F.expr("CAST((1000000 * n_peak) div n_bytes AS BIGINT)").alias(
                "clip_hi_ppm"
            ),
            F.expr("CAST((1000000 * n_floor) div n_bytes AS BIGINT)").alias(
                "clip_lo_ppm"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_clipping_rate",
    oracle=_SQL_HIST
    + """
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_bytes,
           CAST(max(byte) AS BIGINT) AS peak_byte,
           CAST(min(byte) AS BIGINT) AS floor_byte,
           CAST((1000000 * max_by(n, byte)) // sum(n) AS BIGINT)
             AS clip_hi_ppm,
           CAST((1000000 * min_by(n, byte)) // sum(n) AS BIGINT)
             AS clip_lo_ppm
    FROM hist
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_clipping_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping meter over the binary media column: per payload, the
    ppm of bytes pinned at the payload's own peak and floor values —
    the audio recording-chain defect check, computed entirely off the
    bounded mapInPandas byte histogram."""
    return clipping_rate_frame(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal_silence_runs — dead-air / black-frame skeleton: longest
# identical-byte run per payload, how many runs reach the silence
# threshold, and what fraction of the payload sits inside them. The
# run statistics are PURE INTEGERS computed with numpy diff inside the
# decode plumbing; the oracle replays them with gaps-and-islands SQL.
#
# Scale shape: one mapInPandas pass, ONE output row per payload —
# nothing but the scan grows with the corpus.
# ---------------------------------------------------------------------------


def silence_runs_frame(docs: DataFrame) -> DataFrame:
    """Frame core of multimodal_silence_runs (scaling-probe entry)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T
    from ..ops import multimodal as M

    media = M.attach_binary(docs).select("doc_id", "media")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("max_run", T.LongType()),
            T.StructField("n_silence_runs", T.LongType()),
            T.StructField("silence_ppm", T.LongType()),
        ]
    )

    def run_batches(batches):
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = len(arr)
                if n == 0:
                    # drop empty payloads: the oracle's range(1, len+1)
                    # explode emits no rows for them, so a zero row here
                    # would be a Spark-vs-oracle row-count mismatch
                    continue
                # run lengths: distances between change points
                edges = np.flatnonzero(np.diff(arr)) + 1
                bounds = np.concatenate(([0], edges, [n]))
                lens = np.diff(bounds)
                silent = lens[lens >= _RUN_MIN]
                rows.append(
                    (
                        rid,
                        n,
                        int(lens.max()),
                        int(len(silent)),
                        int((1_000_000 * int(silent.sum())) // n),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "max_run",
                    "n_silence_runs", "silence_ppm",
                ],
            )

    return media.mapInPandas(run_batches, out_schema).orderBy("doc_id")


@query(
    "multimodal_silence_runs",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id,
             unnest(range(1, length(text) + 1)) AS i,
             text
      FROM documents
    ),
    c AS (
      SELECT doc_id, i,
             ascii(substr(text, CAST(i AS INTEGER), 1)) AS b
      FROM pos
    ),
    marked AS (
      SELECT doc_id, i, b,
             CASE WHEN b = lag(b) OVER (PARTITION BY doc_id ORDER BY i)
                  THEN 0 ELSE 1 END AS edge
      FROM c
    ),
    grp AS (
      SELECT doc_id, i,
             sum(edge) OVER (PARTITION BY doc_id ORDER BY i) AS g
      FROM marked
    ),
    runs AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS run_len
      FROM grp GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(run_len) AS BIGINT) AS n_bytes,
           CAST(max(run_len) AS BIGINT) AS max_run,
           CAST(sum(CASE WHEN run_len >= {_RUN_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_silence_runs,
           CAST((1000000 * sum(CASE WHEN run_len >= {_RUN_MIN}
                                    THEN run_len ELSE 0 END))
                // sum(run_len) AS BIGINT) AS silence_ppm
    FROM runs
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence/dead-air meter over the binary media column: per
    payload, the longest identical-byte run, the count of runs at or
    above the 3-byte silence threshold, and the ppm of the payload
    inside such runs — integer-only run statistics from numpy inside
    the mapInPandas decode plumbing, replayed by gaps-and-islands SQL
    in the oracle."""
    return silence_runs_frame(table(spark, sf_dir, "documents"))
