"""Quarantine conformance (R-2 replacement) and managed-table DDL
bootstrap + insert-overwrite (S-5/S-6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.conform import conform, conform_with_quarantine
from etl_neotel_sql_automation_spark.io_sinks import (
    ensure_partitioned_table,
    insert_overwrite_date,
)
from etl_neotel_sql_automation_spark.schema import ALLOWED_TABLES, CONDUCTA_SPEC


def test_quarantine_routes_bad_rows(spark):
    cols = ["Agente", "Fecha", "ID"]
    rows = [
        ("ana", "13/08/2026", "7"),
        ("eve", "99/99/2026", "9"),   # bad date -> quarantine
        ("bob", "bad", "8"),          # bad date -> quarantine
    ]
    df = spark.createDataFrame(rows, cols)
    good, bad = conform_with_quarantine(df, CONDUCTA_SPEC)
    assert [r.agente for r in good.collect()] == ["ana"]
    badrows = {r.agente: r.reject_reason for r in bad.collect()}
    assert badrows == {"eve": "null_key:fecha", "bob": "null_key:fecha"}
    # good side identical to the plain conform output
    plain = conform(df, CONDUCTA_SPEC)
    assert {tuple(map(str, r)) for r in good.collect()} == {
        tuple(map(str, r)) for r in plain.collect()
    }


@pytest.fixture()
def managed_table(spark):
    # warehouse dir is a static conf; use the session default and clean up
    name = "tbl_neotel_conducta"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ddl_bootstrap_and_insert_overwrite(spark, managed_table):
    ddl = "agente STRING, id INT, fecha DATE"
    ensure_partitioned_table(spark, managed_table, ddl)
    ensure_partitioned_table(spark, managed_table, ddl)  # idempotent re-run
    assert spark.catalog.tableExists(managed_table)

    def mk(rows):
        return spark.createDataFrame(rows, "agente string, id int, fecha date").select(
            "agente", "id", F.col("fecha")
        )

    import datetime as dt

    d12, d13 = dt.date(2026, 8, 12), dt.date(2026, 8, 13)
    insert_overwrite_date(spark, mk([("ana", 1, d12), ("bob", 2, d13)]), managed_table)
    insert_overwrite_date(spark, mk([("eve", 3, d13)]), managed_table)  # replaces d13 only
    rows = {(r.agente, str(r.fecha)) for r in spark.table(managed_table).collect()}
    assert rows == {("ana", "2026-08-12"), ("eve", "2026-08-13")}

    with pytest.raises(ValueError):
        ensure_partitioned_table(spark, "not_allowed", ddl)
    assert "not_allowed" not in ALLOWED_TABLES
