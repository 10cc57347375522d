"""Skew-mitigation join: salting.

AQE's skew-join split handles most skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in this engine's
sessions); explicit salting remains the tool for *aggregation* skew and
for engines/joins AQE can't split (e.g. a hot build side in a
shuffled-hash join, or pre-AQE clusters).

``salted_join`` produces results identical to a plain equi-join — the
salt only changes the *partitioning*: the big side's hot key spreads
over ``n_salt`` shuffle partitions; the small side is replicated
``n_salt`` times (explode), which is cheap because it is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key``, salted ``n_salt``
    ways. ``salt_from``: a big-side column whose hash picks the salt
    (defaults to the whole-row-stable ``key`` + a per-row component via
    xxhash64 of all big columns — deterministic, no rand())."""
    salt_src = (
        F.xxhash64(*[F.col(c) for c in ([salt_from] if salt_from else big.columns)])
    )
    b = big.withColumn("__salt", F.pmod(salt_src, F.lit(n_salt)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = b.join(s, on=[key, "__salt"], how=how)
    return out.drop("__salt")
