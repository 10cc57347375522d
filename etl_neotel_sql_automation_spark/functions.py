"""Column-function library — the engine's scalar-coercion surface.

Re-expresses the reference's four transform functions
(``limpiar_nombre_columna`` main.py:386, ``convertir_tiempo_a_minutos``
main.py:425, ``procesar_columnas_enteros`` main.py:501,
``procesar_columnas_flotantes`` main.py:516) plus its inline date
handling (main.py:1239, 1295, 1527-1531) as **pure built-in Spark
column expressions** — no Python UDFs, so whole-stage codegen,
predicate pushdown and column pruning stay intact (SURVEY.md §2.10).

Every expression is total (never raises) and ANSI-safe: all parsing
uses ``try_*`` forms, so behavior is identical whether the session has
``spark.sql.ansi.enabled`` true (Spark 4 default) or false.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel strings the reference maps to 0.0 before any parsing
# (main.py:442-443).
TIME_SENTINELS = ("-", "", "nan", "None")

# Python ``int()`` accepts optional sign + digits (after strip); anything
# else — e.g. "30.5" — raises and the reference returns 0.0
# (main.py:450-456 ``map(int, parts)``). Spark's string->int cast is more
# lenient, so we guard with this regex to match Python exactly.
_INT_RE = r"^[+-]?[0-9]+$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _int_part(part: Column) -> Column:
    """Parse one ``HH``/``MM``/``SS`` fragment exactly like Python int():
    strip, require pure digits with optional sign, else null."""
    t = F.trim(part)
    return F.when(t.rlike(_INT_RE), t.try_cast("long"))


def time_str_to_minutes(c: Column | str) -> Column:
    """``HH:MM:SS``/``HH:MM``/numeric/sentinel -> decimal minutes (double).

    Parity target: ``convertir_tiempo_a_minutos`` (main.py:425-462):

    - null, ``'-'``, ``''``, ``'nan'``, ``'None'`` (after strip) -> 0.0
    - ``"01:30:00"`` -> 90.0; ``"02:15"`` -> 135.0 (h*60 + m + s/60)
    - colon-form with non-integer parts (``"ab:cd"``, ``"1:30.5"``) -> 0.0
    - no colon: ``float(str)`` -> value, unparseable -> 0.0

    A single per-value expression subsumes the reference's column-level
    autodetect two-pass (``procesar_columnas_tiempo`` main.py:465-498):
    a value without ``:`` falls through to the numeric branch.
    """
    s = F.trim(_col(c).cast("string"))
    parts = F.split(s, ":")
    n = F.size(parts)
    # F.get (not parts[i]): null-safe on short arrays even under ANSI mode.
    h = _int_part(F.get(parts, 0))
    m = _int_part(F.get(parts, 1))
    sec = _int_part(F.get(parts, 2))
    hms = (
        F.when(
            (n == 3) & h.isNotNull() & m.isNotNull() & sec.isNotNull(),
            h * 60 + m + sec / F.lit(60.0),
        )
        .when((n == 2) & h.isNotNull() & m.isNotNull(), (h * 60 + m).cast("double"))
        .otherwise(F.lit(0.0))
    )
    return (
        F.when(s.isNull() | s.isin(*TIME_SENTINELS), F.lit(0.0))
        .when(s.contains(":"), hms)
        .otherwise(F.coalesce(s.try_cast("double"), F.lit(0.0)))
        .cast("double")
    )


def int0(c: Column | str) -> Column:
    """Int coercion with 0 default, truncating through double.

    Parity target: ``pd.to_numeric(errors='coerce').fillna(0).astype(int)``
    (main.py:501-513): ``"3.7"`` -> 3 (numeric-then-truncate), ``"x"``/null
    -> 0. The cast path must go string->double->int — a direct string->int
    cast would null out ``"3.7"`` instead of truncating.
    """
    return (
        F.coalesce(_col(c).cast("string").try_cast("double"), F.lit(0.0))
        .cast("int")
    )


def float0(c: Column | str) -> Column:
    """Double coercion with 0.0 default
    (``pd.to_numeric(errors='coerce').fillna(0.0)``, main.py:516-528)."""
    return F.coalesce(_col(c).cast("string").try_cast("double"), F.lit(0.0))


# Formats tried in order for day-first parsing. pandas
# ``to_datetime(dayfirst=True, errors='coerce')`` (main.py:1239, 1295)
# infers per element; these cover the report formats plus ISO fallback.
_DAYFIRST_FORMATS = (
    "d/M/yyyy",
    "d/M/yyyy H:mm:ss",
    "d/M/yyyy H:mm",
    "d-M-yyyy",
    "d-M-yyyy H:mm:ss",
    "yyyy-M-d",
    "yyyy-M-d H:mm:ss",
)


def date_dayfirst(c: Column | str) -> Column:
    """Day-first date parse, unparseable -> null (``errors='coerce'``).

    ``"13/08/2026"`` -> 2026-08-13; ``"01/02/2026"`` -> Feb 1 (day first);
    ``"99/99/2026"`` -> null. Parity: main.py:1239, 1295.
    """
    s = F.trim(_col(c).cast("string"))
    candidates = [F.try_to_timestamp(s, F.lit(fmt)) for fmt in _DAYFIRST_FORMATS]
    return F.coalesce(*candidates).cast("date")


def date_to_iso(c: Column | str) -> Column:
    """``DD/MM/YYYY`` string -> ``YYYY-MM-DD`` string, raw value kept on
    parse failure (main.py:1527-1531)."""
    s = _col(c).cast("string")
    parsed = F.try_to_timestamp(F.trim(s), F.lit("d/M/yyyy"))
    return F.coalesce(F.date_format(parsed, "yyyy-MM-dd"), s)


def yesterday_ddmmyyyy() -> Column:
    """``now - 1 day`` formatted ``dd/MM/yyyy`` (main.py:201-209)."""
    return F.date_format(F.date_sub(F.current_date(), 1), "dd/MM/yyyy")


def clean_name(name: object) -> str:
    """Normalize a column *name* for SQL compatibility (driver-side —
    names are schema metadata, not data).

    Parity target ``limpiar_nombre_columna`` (main.py:386-422):
    NFKD accent-strip (``á``->``a``, ``ñ``->``n``), ``%\\s*`` -> ``pct_``,
    non-alphanumerics -> ``_``, collapse/strip ``_``, lowercase.
    ``"% In"`` -> ``"pct_in"``, ``"Año"`` -> ``"ano"``.
    """
    if not isinstance(name, str):
        name = str(name)
    name = unicodedata.normalize("NFKD", name)
    name = name.encode("ASCII", "ignore").decode("ASCII")
    name = re.sub(r"%\s*", "pct_", name)
    name = re.sub(r"[^a-zA-Z0-9]", "_", name)
    name = re.sub(r"_+", "_", name)
    name = name.strip("_")
    return name.lower()


def clean_name_col(c: Column | str) -> Column:
    """``clean_name`` as a *data* expression (same transform applied to
    column values, e.g. when normalizing category labels at scale).

    Accent folding covers the Latin-1 range the reference's reports use;
    arbitrary-unicode NFKD would need a pandas_udf (not worth leaving
    codegen for the ETL surface).
    """
    s = _col(c).cast("string")
    s = F.translate(
        s,
        "áéíóúüñÁÉÍÓÚÜÑàèìòùâêîôûãõçÀÈÌÒÙÂÊÎÔÛÃÕÇ",
        "aeiouunAEIOUUNaeiouaeiouaocAEIOUAEIOUAOC",
    )
    s = F.regexp_replace(s, r"%\s*", "pct_")
    s = F.regexp_replace(s, r"[^a-zA-Z0-9]", "_")
    s = F.regexp_replace(s, r"_+", "_")
    s = F.regexp_replace(s, r"^_|_$", "")
    return F.lower(s)
