"""Registry meta-invariants, cheap enough for every pytest run:
every query has an oracle, every oracle parses and type-checks in
DuckDB (EXPLAIN — no execution), no oracle outputs a HUGEINT column
(the driver-hash type trap), and names are well-formed."""

from __future__ import annotations

import re

import duckdb
import pytest

from etl_neotel_sql_automation_spark import workload

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_registry_names_and_pairing():
    qs, oracles = workload.queries(), workload.oracle_sql()
    assert set(qs) == set(oracles)          # zero rows-only entries
    assert all(re.fullmatch(r"[a-z0-9_]+", n) for n in qs)
    assert len(qs) == len(set(qs))


def test_every_oracle_parses_and_has_no_hugeint_outputs(con):
    """EXPLAIN compiles each oracle (binder + type check, no data run);
    DESCRIBE catches any HUGEINT output column — the class that broke
    graph_pagerank in round 2 — at pytest speed."""
    bad_parse, bad_types = [], []
    for name, sql in workload.oracle_sql().items():
        try:
            con.execute("EXPLAIN " + sql)
            dtypes = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:  # noqa: BLE001
            bad_parse.append((name, str(e).splitlines()[0]))
            continue
        huge = [r[0] for r in dtypes if "HUGEINT" in str(r[1]).upper()]
        if huge:
            bad_types.append((name, huge))
    assert not bad_parse, bad_parse
    assert not bad_types, bad_types
