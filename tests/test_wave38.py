"""Fixture tests for the wave-38 (round 7) workloads — the
Holt-Winters recurrence replayed by hand (three steps with a
negative-trend division), the empty-series guard, and byte-exact
fertility on a multibyte string.
"""

from __future__ import annotations

import datetime


def _orders(spark, tmp_path, day_counts):
    rows = []
    k = 0
    for day, cnt in day_counts:
        for _ in range(cnt):
            rows.append((k, datetime.datetime(1996, 1, day)))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_holt_winters_hand_replayed(spark, tmp_path):
    """y = [8, 12, 6]: two fold steps by hand (zero seasonal seeds).
      step 12: l=10e6, b=5e5, sae=4e6, s7<-5e5
      step 6:  l=8.25e6, b=-62500 (negative-delta div), sae=8.5e6,
               s7<- -562500, previous s7 rotates to slot 6."""
    from etl_neotel_sql_automation_spark.workload.wave38 import (
        timeseries_holt_winters,
    )

    sf = _orders(spark, tmp_path, [(2, 8), (3, 12), (4, 6)])
    r = timeseries_holt_winters(spark, sf).collect()[0]
    assert r["n_days"] == 3
    assert r["level_micro"] == 8_250_000
    assert r["trend_micro"] == -62_500
    assert r["mae_micro"] == 8_500_000 // 2
    assert r["forecast1_micro"] == 8_250_000 - 62_500 + 0
    assert r["forecast6_micro"] == 8_250_000 - 6 * 62_500 + 500_000
    assert r["forecast7_micro"] == 8_250_000 - 7 * 62_500 - 562_500


def test_holt_winters_empty_series(spark, tmp_path):
    from etl_neotel_sql_automation_spark.workload.wave38 import (
        timeseries_holt_winters,
    )

    sf = _orders(spark, tmp_path, [])
    assert timeseries_holt_winters(spark, sf).count() == 0


def test_fertility_multibyte_hand_counted(spark, tmp_path):
    """'héllo wörld': 11 chars, 13 UTF-8 bytes, 2 tokens."""
    from etl_neotel_sql_automation_spark.workload.wave38 import (
        text_tokenizer_fertility,
    )

    spark.createDataFrame(
        [(0, "héllo wörld", "de", "s", 11)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    r = text_tokenizer_fertility(spark, str(tmp_path)).collect()[0]
    assert r["tokens"] == 2
    assert r["chars_per_token_milli"] == (1000 * 11) // 2
    assert r["bytes_per_token_milli"] == (1000 * 13) // 2
    assert r["bytes_per_char_milli"] == (1000 * 13) // 11
