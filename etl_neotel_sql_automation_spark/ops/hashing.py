"""Cross-engine deterministic 64-bit hashing.

``xxhash64`` is Spark-only, so operators built on it (MinHash, SimHash,
winnowing, hyperplane LSH) could not be differentially checked against
a DuckDB oracle. ``md5`` exists in Spark, DuckDB, and Python's hashlib
with identical output; interpreting the first 15 hex chars as a base-16
integer yields the same non-negative 60-bit value in all three engines:

- Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to bigint
- DuckDB: ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``
- Python: ``int(hashlib.md5(x).hexdigest()[:15], 16)``

15 hex chars (not 16) keeps the value < 2^60: comfortably inside a
signed 64-bit integer in every engine, and small enough that linear
permutations ``a*x + b`` over a 2^31 modulus never overflow under
ANSI arithmetic.

The hash itself is computed JVM-side inside whole-stage codegen —
md5 is slower than xxhash64 per call, which matters only in
shingle-explosion hot paths; operators therefore take a ``hash_fn``
parameter defaulting to the faster ``xxhash64`` and switch to ``md5``
when cross-engine reproducibility is required (the registered
driver-facing queries use ``md5`` so the oracle is exact).

Measured cost of the md5 premium (sf0.1, local[32], warm session,
best-of-3, full ``minhash_lsh_candidates`` end-to-end): md5 2.06 s vs
xxhash64 1.64 s — a 1.26× floor. Isolated to the shingle hot path the
two are within noise (2.71 s both, explode-dominated); the premium
comes from the extra ``conv(substring(...))`` decode in the band-bucket
stage. The 2.3× swing recorded in BENCH_r02 was suite-ordering/cold
jitter, not plan cost — bench.py now times BOTH variants
(``dedup_minhash_candidates`` md5 / ``dedup_minhash_xxhash64``) so any
real divergence shows up per-round.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HashFn = str  # "xxhash64" | "md5"


def md5_long(c: Column | str) -> Column:
    """First 15 hex chars of md5 as a non-negative bigint (< 2^60)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def hash64(c: Column | str, hash_fn: HashFn = "xxhash64") -> Column:
    """String -> 64-bit hash column under the chosen hash family."""
    if hash_fn == "xxhash64":
        c = F.col(c) if isinstance(c, str) else c
        return F.xxhash64(c)
    if hash_fn == "md5":
        return md5_long(c)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def sql_md5_long(expr: str) -> str:
    """DuckDB SQL fragment computing :func:`md5_long` of ``expr``."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def py_md5_long(s: str) -> int:
    """Python twin of :func:`md5_long` — used to precompute deterministic
    constants (e.g. LSH hyperplane signs) that are inlined as literals
    into BOTH the Spark plan and the oracle SQL."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
