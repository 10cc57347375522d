"""Property tests: the Spark coercion expressions agree with an
independent Python model of the reference semantics (main.py:425-528)
over adversarial inputs, and never raise."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_neotel_sql_automation_spark import functions as ef


def _py_time_to_minutes(v) -> float:
    """Python model of main.py:425-462 (test oracle, not engine code)."""
    if v is None or str(v).strip() in ("-", "", "nan", "None"):
        return 0.0
    try:
        s = str(v).strip()
        if ":" in s:
            parts = s.split(":")
            if len(parts) == 3:
                h, m, sec = map(int, parts)
                return float(h * 60 + m + sec / 60)
            if len(parts) == 2:
                h, m = map(int, parts)
                return float(h * 60 + m)
            return 0.0  # reference: unpack of map() over !=2,3 parts raises -> 0.0
        return float(s)
    except (ValueError, TypeError):
        return 0.0


def _fuzz_values(n=3000, seed=42):
    rng = random.Random(seed)
    alphabet = string.digits + ":.-+ abc"
    vals = [None, "-", "", "nan", "None", "00:00:00", "1:2", "1:2:3"]
    while len(vals) < n:
        vals.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))))
    return vals


def test_time_to_minutes_fuzz_parity(spark):
    vals = _fuzz_values()
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(ef.time_str_to_minutes("v").alias("m")).collect()]
    for v, g in zip(vals, got):
        want = _py_time_to_minutes(v)
        # NaN compares unequal to itself; both sides must be NaN together
        if want != want:
            assert g != g, f"{v!r}: spark={g} python=NaN"
        else:
            assert abs(g - want) < 1e-9, f"{v!r}: spark={g} python={want}"


def _py_int0(v):
    """Python model of pd.to_numeric(errors='coerce').fillna(0).astype(int)."""
    try:
        f = float(str(v).strip()) if v is not None and str(v).strip() != "" else 0.0
    except (ValueError, TypeError):
        f = 0.0
    if f != f or f in (float("inf"), float("-inf")):
        f = 0.0
    return int(f)


def test_numeric_coercion_fuzz_parity(spark):
    vals = _fuzz_values(n=2000, seed=7)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = df.select(
        ef.int0("v").alias("i"), ef.float0("v").alias("f")
    ).collect()
    for v, r in zip(vals, got):
        assert r.i == _py_int0(v), f"int0({v!r}) = {r.i} != {_py_int0(v)}"


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=40))
def test_clean_name_total_and_idempotent(s):
    out = ef.clean_name(s)
    assert isinstance(out, str)
    # idempotent: cleaning a cleaned name is a no-op
    assert ef.clean_name(out) == out
    # output alphabet is [a-z0-9_], no leading/trailing underscore
    assert all(c in string.ascii_lowercase + string.digits + "_" for c in out)
    assert not out.startswith("_") and not out.endswith("_")
