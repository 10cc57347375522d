"""Round-7 wave-35 workload: Johnson-Lindenstrauss projection with a
measured distortion meter — the dimension-reduction step a 100 TB
embedding pipeline runs BEFORE the ANN index (64 -> 16 dims cuts every
downstream dot product 4x), shipped the house way: the approximate
transform plus the differential meter that says what it costs.

emb_jl_distortion projects each embedding through a deterministic
16 x 64 ±1 sign matrix (ops.similarity.hyperplane_signs, seed 7 —
disjoint from the LSH bucketing family) and measures, over every pair
of a literal-bounded sample (vec_id < 40 -> 780 pairs), the squared-
distance ratio d2_proj / (k * d2_orig) in ppm (the JL lemma says the
expectation is exactly 1): mean / min / max and the fraction of pairs
within 10% and 30% of isometry.

Determinism (the LSH bucket-id property, extended to distances):
embeddings are quantized to integer-valued doubles (round(x*1e6)), so
every dot product is an exact IEEE sum (values << 2^53) in ANY order
on both engines; original squared distances come from the polarization
identity |a|^2+|b|^2-2ab over those exact dots. Projected coordinates
(<= 6.4e7) are cast to BIGINT before squaring — their squares exceed
2^53, so the projected distance is a generated 16-term BIGINT sum, not
a float fold.

Scale notes: the projection is a scan-side generated-SQL unrolled
expression (the _bucket_sql lesson: one py4j round trip, codegen CSE
hoists the shared quantize); the meter's pair join is literal-bounded
(40 x 40, broadcast hint with a stated bound in the plan allowlist).
At 100 TB the projection runs on every row; the meter runs on this
hash-sample, exactly as registered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from ..ops.similarity import hyperplane_signs

_JL_DIM = 64
_JL_K = 16
_JL_SEED = 7
_JL_SAMPLE = 40  # literal pair-sample bound: 780 pairs
_SIGNS = hyperplane_signs(_JL_DIM, _JL_K, seed=_JL_SEED)

_QV_SPARK = (
    "transform(transform(embedding, x -> CAST(x AS DOUBLE)),"
    " x -> round(x * 1000000))"
)
_QV_DUCK = (
    "list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000000))"
)


def _proj_cols_spark() -> list[str]:
    cols = []
    for j, srow in enumerate(_SIGNS):
        arr = "array(" + ",".join(f"{float(s)}D" for s in srow) + ")"
        cols.append(
            f"CAST(aggregate(zip_with(qd, {arr}, (x, y) -> x * y),"
            f" 0.0D, (acc, x) -> acc + x) AS BIGINT) AS p{j}"
        )
    return cols


def _proj_cols_duck() -> list[str]:
    cols = []
    for j, srow in enumerate(_SIGNS):
        arr = "[" + ",".join(f"{float(s)}" for s in srow) + "]::DOUBLE[]"
        cols.append(
            f"CAST(list_dot_product(qd, {arr}) AS BIGINT) AS p{j}"
        )
    return cols


def _d2p_sum(a: str, b: str) -> str:
    """Exact BIGINT 16-term projected squared distance (projected
    coordinate squares exceed 2^53 — no float fold allowed here)."""
    return " + ".join(
        f"({a}.p{j} - {b}.p{j}) * ({a}.p{j} - {b}.p{j})"
        for j in range(_JL_K)
    )


def jl_distortion_frame(emb: DataFrame) -> DataFrame:
    """Frame core of emb_jl_distortion (scaling-probe entry)."""
    base = emb.filter(F.col("vec_id") < _JL_SAMPLE).selectExpr(
        "vec_id", f"{_QV_SPARK} AS qd"
    )
    w = base.selectExpr(
        "vec_id",
        "qd",
        "CAST(aggregate(zip_with(qd, qd, (x, y) -> x * y), 0.0D,"
        " (acc, x) -> acc + x) AS BIGINT) AS n2",
        *_proj_cols_spark(),
    )
    a = w.alias("a")
    b = w.alias("b")
    # 40x40 literal-bounded self-join: broadcast the right side (the
    # unhinted form plans a CartesianProduct that re-reads the
    # projection per partition pair — the wave-23 lesson)
    pairs = a.join(
        F.broadcast(b), F.expr("a.vec_id < b.vec_id")
    ).select(
        F.expr(
            "CAST(a.n2 + b.n2 - 2 * aggregate(zip_with(a.qd, b.qd,"
            " (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("d2o"),
        F.expr(f"CAST({_d2p_sum('a', 'b')} AS BIGINT)").alias("d2p"),
    )
    # quantized squared distances carry a shared 1e12 factor; divide
    # both by 1e6 before the ratio so the ppm numerator stays in
    # BIGINT (d2p can reach ~7e16; *1e6 would overflow int64). Pairs
    # closer than 1e-3 in raw units (d2o < 1e6) are excluded — the
    # ratio of two near-zero distances is noise, not distortion.
    r = pairs.filter(F.col("d2o") >= 1_000_000).select(
        F.expr(
            f"(1000000 * (d2p div 1000000))"
            f" div ({_JL_K} * (d2o div 1000000))"
        ).alias("ratio")
    )
    return r.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.expr("CAST(sum(ratio) div count(*) AS BIGINT)").alias("mean_ppm"),
        F.min("ratio").cast("bigint").alias("min_ppm"),
        F.max("ratio").cast("bigint").alias("max_ppm"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN abs(ratio - 1000000) <= 100000"
            " THEN 1 ELSE 0 END) div count(*) AS BIGINT)"
        ).alias("within10_ppm"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN abs(ratio - 1000000) <= 300000"
            " THEN 1 ELSE 0 END) div count(*) AS BIGINT)"
        ).alias("within30_ppm"),
    )


def _jl_oracle() -> str:
    proj_cols = ",\n             ".join(_proj_cols_duck())
    return f"""
    WITH v AS (
      SELECT vec_id, {_QV_DUCK} AS qd
      FROM embeddings WHERE vec_id < {_JL_SAMPLE}
    ),
    w AS (
      SELECT vec_id, qd,
             CAST(list_dot_product(qd, qd) AS BIGINT) AS n2,
             {proj_cols}
      FROM v
    ),
    pr AS (
      SELECT CAST(a.n2 + b.n2 - 2 * list_dot_product(a.qd, b.qd)
                  AS BIGINT) AS d2o,
             CAST({_d2p_sum('a', 'b')} AS BIGINT) AS d2p
      FROM w a JOIN w b ON a.vec_id < b.vec_id
    ),
    r AS (
      SELECT (1000000 * (d2p // 1000000))
             // ({_JL_K} * (d2o // 1000000)) AS ratio
      FROM pr WHERE d2o >= 1000000
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ratio) // count(*) AS BIGINT) AS mean_ppm,
           CAST(min(ratio) AS BIGINT) AS min_ppm,
           CAST(max(ratio) AS BIGINT) AS max_ppm,
           CAST(1000000 * sum(CASE WHEN abs(ratio - 1000000) <= 100000
                              THEN 1 ELSE 0 END) // count(*) AS BIGINT)
             AS within10_ppm,
           CAST(1000000 * sum(CASE WHEN abs(ratio - 1000000) <= 300000
                              THEN 1 ELSE 0 END) // count(*) AS BIGINT)
             AS within30_ppm
    FROM r
    """


@query("emb_jl_distortion", oracle=_jl_oracle())
def emb_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss 64->16 sign-projection distortion meter:
    pairwise squared-distance ratio (ppm of isometry) over a
    literal-bounded sample — mean/min/max and the within-10%/30%
    concentration."""
    return jl_distortion_frame(table(spark, sf_dir, "embeddings"))
