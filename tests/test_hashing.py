"""Property test for the cross-engine hash primitive (ops/hashing.py):
md5_long must agree bit-for-bit across Spark, DuckDB, and Python on
arbitrary strings — every hash-based oracle (MinHash, SimHash,
winnowing, LSH) rests on this equivalence."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_neotel_sql_automation_spark.ops.hashing import (
    md5_long,
    py_md5_long,
    sql_md5_long,
)

# printable + unicode + whitespace; exclude surrogates (not encodable)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=60
)


@given(st.lists(_TEXT, min_size=1, max_size=30, unique=True))
@settings(max_examples=20, deadline=None)
def test_md5_long_python_equals_duckdb(strings):
    con = duckdb.connect()
    for s in strings:
        d = con.execute(
            f"SELECT {sql_md5_long('?')}".replace("CAST(? AS VARCHAR)", "?"), [s]
        ).fetchone()[0]
        assert d == py_md5_long(s), s


def test_md5_long_spark_equals_python_and_duckdb(spark):
    """One Spark job over a fixed adversarial corpus (empty string,
    whitespace, unicode, separators, long runs) — all three engines
    must produce the identical 60-bit value."""
    corpus = [
        "", " ", "\t", "a", "0", "hello world", "ünïcode ñ €", "a,b,c",
        "line\nbreak", "trailing ", " leading", "ação über 北京",
        "x" * 500, "1:2:42", "-1", "\x01sep\x01",
    ]
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = {r.s: r.h for r in df.select("s", md5_long("s").alias("h")).collect()}
    con = duckdb.connect()
    for s in corpus:
        expected = py_md5_long(s)
        assert got[s] == expected, f"spark mismatch on {s!r}"
        d = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert d == expected, f"duckdb mismatch on {s!r}"
