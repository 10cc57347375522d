"""Conformance-operator tests: raw report CSV shapes (FIXTURES.md §A)
through ``conform`` must reproduce the reference pipeline's output
semantics (main.py:1207-1308)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_neotel_sql_automation_spark.conform import (
    conform,
    drop_all_null_rows,
    normalize_column_names,
)
from etl_neotel_sql_automation_spark.schema import (
    CONDUCTA_FINAL_COLS,
    CONDUCTA_SPEC,
    ESTADOS_FINAL_COLS,
    ESTADOS_SPEC,
)


def _raw_conducta(spark):
    # Raw headers as the CRM emits them (FIXTURES.md §A1) — accents,
    # '%', reserved words, an extra column, and a missing one
    # (out_dialing family absent -> must be null-padded then 0-coerced).
    cols = ["Agente", "Fecha", "ID", "Campaña", "In", "% In", "Out",
            "% Out", "Tiempo medio de respuesta IN", "Extra Col"]
    rows = [
        ("ana", "13/08/2026", "7", "ventas", "12", "55.5", "3", "44.5", "01:30:00", "x"),
        ("bob", "13/08/2026", "8", "soporte", "bad", "-", "9", "", "02:15", "y"),
        ("eve", "99/99/2026", "9", "ventas", "1", "2", "3", "4", "-", "z"),  # bad date -> dropped
        ("mal", "12/08/2026", "oops", "ventas", "5", "6", "7", "8", "ab:cd", "w"),  # id->0, kept
    ]
    return spark.createDataFrame(rows, cols)


def test_conform_conducta_schema(spark):
    out = conform(_raw_conducta(spark), CONDUCTA_SPEC)
    assert out.columns == CONDUCTA_FINAL_COLS
    # compare names + types; nullability is advisory (coerced columns
    # come out non-nullable thanks to the 0-defaults)
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in CONDUCTA_SPEC.target_schema().fields]
    assert got == want


def test_conform_conducta_values(spark):
    out = conform(_raw_conducta(spark), CONDUCTA_SPEC)
    rows = {r.agente: r for r in out.collect()}
    # bad-date row dropped (fecha null after coerce; key filter)
    assert set(rows) == {"ana", "bob", "mal"}
    ana = rows["ana"]
    assert ana.fecha.isoformat() == "2026-08-13"
    assert ana.in_total == 12 and ana.out_total == 3
    assert ana.pct_in == pytest.approx(55.5)
    assert ana.tiempo_medio_respuesta_in == pytest.approx(90.0)
    # missing source columns -> 0 after coercion, not null
    assert ana.out_dialing == 0 and ana.pct_out_dialing == 0.0
    assert ana.tiempo_medio_respuesta_out == 0.0
    # string column missing entirely -> stays null
    assert ana.llamados_con_hold == 0
    bob = rows["bob"]
    assert bob.in_total == 0          # "bad" -> 0
    assert bob.pct_in == 0.0          # "-" -> 0.0
    assert bob.pct_out == 0.0         # "" -> 0.0
    assert bob.tiempo_medio_respuesta_in == pytest.approx(135.0)
    mal = rows["mal"]
    assert mal.id == 0                # int-coerced key never drops a row
    assert mal.tiempo_medio_respuesta_in == 0.0  # "ab:cd" -> 0.0


def test_conform_estados(spark):
    cols = ["Fecha", "Intervalo", "ID", "Agente", "ID Campaña", "Campaña",
            "T Login", "T Diario Login"]
    rows = [
        ("13/08/2026", "09:00 - 09:30", "1", "ana", "5", "v", "00:30:00", "01:00:00"),
        ("13/08/2026", "09:30 - 10:00", "2", "bob", "5", "v", "7.5", "x"),
    ]
    out = conform(spark.createDataFrame(rows, cols), ESTADOS_SPEC)
    assert out.columns == ESTADOS_FINAL_COLS
    rows = {r.agente: r for r in out.collect()}
    assert rows["ana"].t_login == pytest.approx(30.0)
    assert rows["ana"].t_diario_login == pytest.approx(60.0)
    assert rows["bob"].t_login == pytest.approx(7.5)
    assert rows["bob"].t_diario_login == 0.0
    # all 24 unsupplied t_* columns coerced to 0.0, never null
    for c in ESTADOS_FINAL_COLS:
        if c.startswith("t_") and c not in ("t_login", "t_diario_login"):
            assert getattr(rows["ana"], c) == 0.0, c


def test_normalize_collision_suffix(spark):
    df = spark.createDataFrame([(1, 2)], ["A b", "a_b"])
    out = normalize_column_names(df)
    assert out.columns == ["a_b", "a_b_1"]


def test_drop_all_null_rows(spark):
    df = spark.createDataFrame(
        [Row(a=None, b=None), Row(a="x", b=None)],
        T.StructType([T.StructField("a", T.StringType()), T.StructField("b", T.StringType())]),
    )
    assert drop_all_null_rows(df).count() == 1


def test_conform_is_narrow(spark):
    """Conformance must not shuffle: the physical plan should contain
    no Exchange — it's a single projection over the scan."""
    out = conform(_raw_conducta(spark), CONDUCTA_SPEC, add_load_date=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_conform_load_date(spark):
    out = conform(_raw_conducta(spark), CONDUCTA_SPEC, add_load_date=True)
    assert out.columns[-1] == "load_date"
    assert all(r.load_date is not None for r in out.collect())
