"""Round-9 wave-73 workloads: multimodal parity with the text/emb
families (r8 VERDICT #7) — three more first-class operations over the
opaque binary media column, all riding the shared mapInPandas /
mapInArrow decode plumbing with byte-exact DuckDB replay (the corpus
is printable ASCII, the multimodal_frame_sample precedent):

- multimodal_dim_profile — the image-dimension/EXIF-style corpus
  profile a curation run reads before resize policy: orientation class
  and width bucket from the mapInArrow feature extraction, with counts
  and byte totals per cell.
- multimodal_phash_quality — the banding-recall quality meter for the
  pHash near-dup ladder (the dedup_minhash_quality precedent): exact
  Hamming ground truth on a deterministic md5 hash-sample vs what the
  15-bit band candidate join can catch, at a radius WIDE enough
  (8 > bands-1 = 3) that banding can genuinely miss pairs.
- multimodal_phash_capture_recapture — the wave-71 audit transplanted
  to the pHash ladder: split the 4 bands into two disjoint capture
  occasions, Chapman/Lincoln-Petersen over exact-verified near-dup
  pairs — dedup coverage the IMAGE pipeline can estimate about itself
  at 100 TB with no brute-force truth.

Determinism: the aHash bit math is integer (cross-multiplied mean
comparison), Hamming distances are bit_count over BIGINT on both
engines, ratios are floor-div ppm, and the estimators reuse the exact
integer Chapman form pinned in wave71.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from ..ops.hashing import sql_md5_long
from .multimodal_extra import (
    _AHASH_BANDS,
    _BUCKET_CAP,
    SQL_AHASH,
    SQL_BANDED_CAND,
    ahash_frame,
    banded_candidate_occurrences,
)

_QUAL_MAXH = 8   # near-dup radius for the quality/audit meters: wider
# than bands-1 = 3, so a true pair CAN differ in every 15-bit band and
# banding recall is a measurement, not an identity
_QUAL_MOD = 2    # deterministic md5 hash-sample for the ground-truth leg
_CR_SPLIT = _AHASH_BANDS // 2  # bands 0-1 = occasion A, 2-3 = B


# ---------------------------------------------------------------------------
# multimodal_dim_profile — the EXIF-style corpus profile: every image
# pipeline's first question (what resolutions/orientations am I
# holding, and where are the bytes?) answered from the mapInArrow
# feature extraction, never decoding on the driver.
#
# Scale shape: one embarrassingly-parallel Arrow pass over payload
# partitions, then a combinable aggregate on a (3 x 10)-bounded key —
# nothing grows with the corpus but the scan.
# ---------------------------------------------------------------------------

_DIM_BIN = 64  # width bucket granularity (px)


def dim_profile_frame(docs: DataFrame) -> DataFrame:
    """Frame core of multimodal_dim_profile (scaling-probe entry)."""
    from ..ops import multimodal as M

    feats = M.extract_features_arrow(M.attach_binary(docs))
    return (
        feats.select(
            F.when(F.col("width") > F.col("height"), "landscape")
            .when(F.col("width") < F.col("height"), "portrait")
            .otherwise("square")
            .alias("orientation"),
            F.expr(f"CAST(width div {_DIM_BIN} AS BIGINT)").alias("width_bin"),
            "n_bytes",
            "height",
        )
        .groupBy("orientation", "width_bin")
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("height").cast("bigint").alias("min_height"),
            F.max("height").cast("bigint").alias("max_height"),
        )
        .orderBy("orientation", "width_bin")
    )


@query(
    "multimodal_dim_profile",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
             CAST(ascii(substr(text, 1, 1)) % 480 AS INTEGER) AS height
      FROM documents
    )
    SELECT CASE WHEN width > height THEN 'landscape'
                WHEN width < height THEN 'portrait'
                ELSE 'square' END AS orientation,
           CAST(width // {_DIM_BIN} AS BIGINT) AS width_bin,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(height) AS BIGINT) AS min_height,
           CAST(max(height) AS BIGINT) AS max_height
    FROM f
    GROUP BY 1, 2
    ORDER BY orientation, width_bin
    """,
)
def multimodal_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dimension/EXIF-style profile over the binary media column:
    orientation class x 64-px width bucket, with image counts, byte
    totals, and the height envelope per cell — computed via the
    zero-copy mapInArrow feature extraction
    (ops/multimodal.py:extract_features_arrow), dimensions never
    touching the driver."""
    return dim_profile_frame(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal_phash_quality — banding recall vs exact Hamming truth.
# Ground truth is an all-pairs Hamming join, affordable ONLY on a
# sample: the a/b sides are the deterministic md5 hash-sample (mod 2)
# of the HASH frame — 60-bit integers, not payloads — so the exact leg
# is |sample|^2/2 single-instruction bit_counts (the
# sim_margin_quality_sampled metering recipe; at 100 TB you tighten
# the mod, never widen to the full corpus). "Caught" is computed
# per true pair directly from the two hashes (does ANY 15-bit band
# agree?) — algebraically identical to membership in the banded-LSH
# candidate join, without re-running it.
# ---------------------------------------------------------------------------


def phash_quality_frame(docs: DataFrame, mod: int = _QUAL_MOD) -> DataFrame:
    """Frame core of multimodal_phash_quality (scaling-probe entry).

    ``mod`` is the deploy knob: the ground-truth leg is all-pairs over
    the md5 hash-sample, so at s times the corpus you run mod = s *
    2 to hold the sample (and the truth join) CONSTANT-sized —
    the sim_margin_quality_sampled metering recipe. The registered
    query pins mod at the test-SF default."""
    from ..ops.hashing import md5_long

    # checkpoint once: the decode pass feeds occupancy, both truth
    # sides, and the caught chain (the 62 -> 7 s probe lesson)
    h_full = ahash_frame(docs).localCheckpoint()
    # FULL-corpus bucket occupancy: "caught" means caught by the
    # DEPLOYED capped ladder, so a band match inside a fat bucket
    # (skipped in production) does not count — occupancy is a
    # whole-corpus property even when truth runs on the sample
    kb = h_full.select(
        "doc_id",
        "ahash",
        F.explode(F.sequence(F.lit(0), F.lit(_AHASH_BANDS - 1))).alias("k"),
    ).withColumn("band", F.expr("shiftright(ahash, 15 * k) & 32767"))
    occ = kb.groupBy("k", "band").agg(F.count("*").alias("occ_n"))
    s = h_full.filter(md5_long(F.col("doc_id")) % mod == 0)
    a = s.select(F.col("doc_id").alias("id_a"), F.col("ahash").alias("ha"))
    b = s.select(F.col("doc_id").alias("id_b"), F.col("ahash").alias("hb"))
    # documented brute-force-on-sample leg: the ground-truth join is
    # deliberately all-pairs over the SAMPLED 8-byte hash frame
    true_pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "ha",
            "hb",
            F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _QUAL_MAXH)
    )
    caught = (
        true_pairs.select(
            "id_a",
            "id_b",
            F.explode(F.sequence(F.lit(0), F.lit(_AHASH_BANDS - 1))).alias(
                "k"
            ),
            "ha",
            "hb",
        )
        .withColumn("band", F.expr("shiftright(ha, 15 * k) & 32767"))
        .filter(
            F.expr("shiftright(ha, 15 * k) & 32767")
            == F.expr("shiftright(hb, 15 * k) & 32767")
        )
        .join(occ, ["k", "band"])
        .filter(F.col("occ_n") <= _BUCKET_CAP)
        .select("id_a", "id_b")
        .distinct()
        .withColumn("banded", F.lit(1))
    )
    marked = true_pairs.join(caught, ["id_a", "id_b"], "left").select(
        "hamming", F.coalesce("banded", F.lit(0)).alias("banded")
    )
    return marked.agg(
        F.count("*").cast("bigint").alias("n_true"),
        F.coalesce(F.sum("banded"), F.lit(0)).cast("bigint").alias("n_caught"),
        F.expr(
            "CAST(CASE WHEN count(*) > 0 THEN"
            " (1000000 * coalesce(sum(banded), 0)) div count(*)"
            " ELSE 1000000 END AS BIGINT)"
        ).alias("recall_ppm"),
        F.coalesce(
            F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_exact_dup"),
    )


@query(
    "multimodal_phash_quality",
    oracle=SQL_AHASH
    + SQL_BANDED_CAND
    + f""",
    s AS (
      SELECT doc_id, ahash FROM h
      WHERE {sql_md5_long("doc_id")} % {_QUAL_MOD} = 0
    ),
    t AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.ahash AS ha, b.ahash AS hb,
             CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.ahash, b.ahash)) <= {_QUAL_MAXH}
    ),
    caught AS (
      SELECT DISTINCT t.id_a, t.id_b
      FROM t, range({_AHASH_BANDS}) bk(k)
      JOIN occ ON occ.k = bk.k
              AND occ.band = (t.ha >> (15 * CAST(bk.k AS INTEGER))) & 32767
      WHERE (t.ha >> (15 * CAST(bk.k AS INTEGER))) & 32767
            = (t.hb >> (15 * CAST(bk.k AS INTEGER))) & 32767
        AND occ.occ_n <= {_BUCKET_CAP}
    ),
    marked AS (
      SELECT t.hamming,
             CASE WHEN caught.id_a IS NULL THEN 0 ELSE 1 END AS banded
      FROM t LEFT JOIN caught USING (id_a, id_b)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           CAST(coalesce(sum(banded), 0) AS BIGINT) AS n_caught,
           CAST(CASE WHEN count(*) > 0 THEN
                  (1000000 * coalesce(sum(banded), 0)) // count(*)
                ELSE 1000000 END AS BIGINT) AS recall_ppm,
           CAST(coalesce(sum(CASE WHEN hamming = 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_exact_dup
    FROM marked
    """,
)
def multimodal_phash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the 15-bit-band pHash candidate join against exact
    Hamming ground truth at radius 8 (where banding CAN miss), measured
    on the deterministic md5 hash-sample — the image-dedup twin of
    dedup_minhash_quality: how much of the near-dup population does the
    production banded ladder actually surface?"""
    return phash_quality_frame(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal_phash_capture_recapture — the wave-71 estimator on the
# pHash ladder: bands 0-1 and bands 2-3 are two disjoint capture
# occasions; each catches a subset of the exact-verified near-dup
# pairs; Chapman estimates the total near-dup population (and hence
# coverage) with NO brute-force truth. Unlike the quality meter this
# runs the REAL banded candidate join full-corpus — the shape that
# ships at 100 TB.
#
# Scale shape: one mapInPandas hash pass, a banded equi-join (never
# all-pairs), one bit_count verification per candidate, then a 1-row
# aggregate.
# ---------------------------------------------------------------------------


def phash_capture_recapture_frame(docs: DataFrame) -> DataFrame:
    """Frame core of multimodal_phash_capture_recapture
    (scaling-probe entry)."""
    cand = (
        banded_candidate_occurrences(ahash_frame(docs))
        .groupBy("id_a", "id_b")
        .agg(
            F.first("ha").alias("ha"),
            F.first("hb").alias("hb"),
            F.max(F.when(F.col("k") < _CR_SPLIT, 1).otherwise(0))
            .cast("bigint")
            .alias("cap_a"),
            F.max(F.when(F.col("k") >= _CR_SPLIT, 1).otherwise(0))
            .cast("bigint")
            .alias("cap_b"),
        )
    )
    dup = cand.filter(
        F.expr(f"bit_count(ha ^ hb) <= {_QUAL_MAXH}")
    ).select("cap_a", "cap_b")
    t = dup.agg(
        F.count("*").cast("bigint").alias("n_caught"),
        F.coalesce(F.sum("cap_a"), F.lit(0)).cast("bigint").alias("n1"),
        F.coalesce(F.sum("cap_b"), F.lit(0)).cast("bigint").alias("n2"),
        F.coalesce(F.sum(F.col("cap_a") * F.col("cap_b")), F.lit(0))
        .cast("bigint")
        .alias("m_both"),
    )
    chap = "((n1 + 1) * (n2 + 1) div (m_both + 1) - 1)"
    return t.select(
        "n_caught",
        "n1",
        "n2",
        "m_both",
        F.expr(f"CAST({chap} AS BIGINT)").alias("chapman_est"),
        F.expr(
            f"CAST(greatest({chap} - n_caught, 0) AS BIGINT)"
        ).alias("est_missed"),
        F.expr(
            f"CAST(CASE WHEN {chap} > 0"
            f" THEN (1000000 * n_caught) div {chap} ELSE 1000000 END"
            " AS BIGINT)"
        ).alias("coverage_ppm"),
    )


@query(
    "multimodal_phash_capture_recapture",
    oracle=SQL_AHASH
    + SQL_BANDED_CAND
    + f""",
    cand AS (
      SELECT id_a, id_b,
             any_value(ha) AS ha, any_value(hb) AS hb,
             CAST(max(CASE WHEN k < {_CR_SPLIT} THEN 1 ELSE 0 END)
                  AS BIGINT) AS cap_a,
             CAST(max(CASE WHEN k >= {_CR_SPLIT} THEN 1 ELSE 0 END)
                  AS BIGINT) AS cap_b
      FROM cand_k
      GROUP BY id_a, id_b
    ),
    dup AS (
      SELECT cap_a, cap_b FROM cand
      WHERE bit_count(xor(ha, hb)) <= {_QUAL_MAXH}
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_caught,
             CAST(coalesce(sum(cap_a), 0) AS BIGINT) AS n1,
             CAST(coalesce(sum(cap_b), 0) AS BIGINT) AS n2,
             CAST(coalesce(sum(cap_a * cap_b), 0) AS BIGINT) AS m_both
      FROM dup
    )
    SELECT n_caught, n1, n2, m_both,
           CAST((n1 + 1) * (n2 + 1) // (m_both + 1) - 1 AS BIGINT)
             AS chapman_est,
           CAST(greatest((n1 + 1) * (n2 + 1) // (m_both + 1) - 1
                - n_caught, 0) AS BIGINT) AS est_missed,
           CAST(CASE WHEN (n1 + 1) * (n2 + 1) // (m_both + 1) - 1 > 0
                THEN (1000000 * n_caught)
                     // ((n1 + 1) * (n2 + 1) // (m_both + 1) - 1)
                ELSE 1000000 END AS BIGINT) AS coverage_ppm
    FROM agg
    """,
)
def multimodal_phash_capture_recapture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Capture–recapture audit of pHash image dedup: the two disjoint
    band halves as capture occasions over exact-Hamming-verified
    near-dup pairs (radius 8); Chapman population estimate, implied
    missed pairs, and catch coverage (ppm) — the coverage metric a
    100 TB image-dedup run computes about itself."""
    return phash_capture_recapture_frame(table(spark, sf_dir, "documents"))
