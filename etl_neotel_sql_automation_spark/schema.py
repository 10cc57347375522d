"""Target schemas, rename maps and conformance specs for the two
report pipelines.

Parity sources: ``MAPEO_CONDUCTA`` main.py:110-133,
``COLUMNAS_FINALES_CONDUCTA`` main.py:135-146, ``MAPEO_ESTADOS`` +
``COLUMNAS_FINALES_ESTADOS`` main.py:148-183, SQL DDL main.py:1375-1441,
per-column coercion assignments main.py:1242-1255 and 1298-1303.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# 'in'/'out' are SQL reserved words -> renamed (main.py:115, 121).
CONDUCTA_RENAME = {
    "in": "in_total",
    "out": "out_total",
    "tiempo_medio_de_respuesta_in": "tiempo_medio_respuesta_in",
    "tiempo_medio_de_respuesta_out": "tiempo_medio_respuesta_out",
}

CONDUCTA_FINAL_COLS = [
    "agente", "fecha", "id", "campana",
    "in_total", "pct_in",
    "in_rechazadas_ignoradas", "pct_in_rechazadas_ignoradas",
    "in_atendidas", "pct_in_atendidas",
    "out_total", "pct_out",
    "out_rechazadas_ignoradas", "pct_out_rechazadas_ignoradas",
    "out_atendidas", "pct_out_atendidas",
    "out_dialing", "pct_out_dialing",
    "llamados_con_hold", "pct_llamados_con_hold",
    "tiempo_medio_respuesta_in", "tiempo_medio_respuesta_out",
]

CONDUCTA_INT_COLS = [
    "id", "in_total", "in_rechazadas_ignoradas", "in_atendidas",
    "out_total", "out_rechazadas_ignoradas", "out_atendidas",
    "out_dialing", "llamados_con_hold",
]
CONDUCTA_FLOAT_COLS = [c for c in CONDUCTA_FINAL_COLS if "pct" in c]
CONDUCTA_TIME_COLS = ["tiempo_medio_respuesta_in", "tiempo_medio_respuesta_out"]

_ESTADOS_STATES = [
    "login", "login_neto", "available", "preview", "dialing", "ringing",
    "talking", "talking_in", "talking_out", "hold", "acw", "other_crm",
    "pause",
]
ESTADOS_FINAL_COLS = (
    ["fecha", "intervalo", "id", "agente", "id_campana", "campana"]
    + [f"t_{s}" for s in _ESTADOS_STATES]
    + [f"t_diario_{s}" for s in _ESTADOS_STATES]
)
ESTADOS_RENAME: dict[str, str] = {}  # identity map (main.py:148-181)
ESTADOS_INT_COLS = ["id", "id_campana"]
# every t_* column is a time column (main.py:1302-1303)
ESTADOS_TIME_COLS = [c for c in ESTADOS_FINAL_COLS if c.startswith("t_")]


@dataclass(frozen=True)
class ConformSpec:
    """Declarative description of one report's conformance pipeline
    (the main.py:1207-1308 seam as data, not code)."""

    name: str
    rename_map: dict[str, str]
    final_cols: list[str]
    date_cols: list[str] = field(default_factory=list)
    int_cols: list[str] = field(default_factory=list)
    float_cols: list[str] = field(default_factory=list)
    time_cols: list[str] = field(default_factory=list)
    # Coercion runs BEFORE the key filter (main.py:1242 vs 1258), so
    # int-coerced keys are 0-filled and only genuinely-null keys
    # (dates, strings) can drop rows. Order is preserved here.
    key_cols: list[str] = field(default_factory=list)

    def no_key_filter(self) -> "ConformSpec":
        """Variant that skips the key-null row filter (quarantine flow)."""
        from dataclasses import replace

        return replace(self, key_cols=[])

    def target_schema(self) -> T.StructType:
        fields = []
        for c in self.final_cols:
            if c in self.date_cols:
                t: T.DataType = T.DateType()
            elif c in self.int_cols:
                t = T.IntegerType()
            elif c in self.float_cols or c in self.time_cols:
                t = T.DoubleType()
            else:
                t = T.StringType()
            fields.append(T.StructField(c, t, True))
        return T.StructType(fields)


CONDUCTA_SPEC = ConformSpec(
    name="conducta",
    rename_map=CONDUCTA_RENAME,
    final_cols=CONDUCTA_FINAL_COLS,
    date_cols=["fecha"],
    int_cols=CONDUCTA_INT_COLS,
    float_cols=CONDUCTA_FLOAT_COLS,
    time_cols=CONDUCTA_TIME_COLS,
    key_cols=["id", "fecha"],
)

ESTADOS_SPEC = ConformSpec(
    name="estados_operativos",
    rename_map=ESTADOS_RENAME,
    final_cols=ESTADOS_FINAL_COLS,
    date_cols=["fecha"],
    int_cols=ESTADOS_INT_COLS,
    float_cols=[],
    time_cols=ESTADOS_TIME_COLS,
    key_cols=["id", "fecha"],
)

SPECS = {s.name: s for s in (CONDUCTA_SPEC, ESTADOS_SPEC)}

# Sink table names + whitelist (R-4, main.py:99-100).
TABLE_FOR_SPEC = {
    "conducta": "tbl_neotel_conducta",
    "estados_operativos": "tbl_neotel_estados_operativos",
}
ALLOWED_TABLES = frozenset(TABLE_FOR_SPEC.values())
