"""Driver-contract smoke: entry() returns rows on sf0.001; every
registered query runs there and every oracle key exists in queries().
(Full differential parity vs DuckDB runs via tools/check_oracle.py.)"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    # every oracle is non-trivial SQL
    assert all("SELECT" in s.upper() for s in oracles.values())


def test_all_queries_run_sf0001(spark):
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, SF).limit(5).collect()
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures
