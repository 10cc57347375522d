"""Fixture tests for the wave-29 (round 6) workloads — semantics the
oracle differential cannot pin: the decomposition identity (volume +
value = delta EXACTLY in cents, with pure-volume and pure-value cases
isolating each effect), and the MLM audit's accounting identities
(masked + random + kept = selected; selection rate concentrates near
150000 ppm on a large corpus; identical inputs replay identical
decisions).
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def _orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_pvm_pure_volume_and_pure_value(spark, tmp_path):
    """Segment A: same $100 AOV, 2 -> 5 orders (pure volume: value
    effect exactly 0). Segment B: 2 -> 2 orders, AOV $100 -> $150
    (pure value: volume effect exactly 0). Identity holds in cents."""
    from etl_neotel_sql_automation_spark.workload.wave29 import (
        orders_price_volume_mix,
    )

    d0, d1 = datetime.datetime(1997, 6, 1), datetime.datetime(1998, 6, 1)
    rows = []
    oid = 0
    for _ in range(2):
        rows.append((oid := oid + 1, 1, 100.0, d0, "A"))
    for _ in range(5):
        rows.append((oid := oid + 1, 1, 100.0, d1, "A"))
    for _ in range(2):
        rows.append((oid := oid + 1, 1, 100.0, d0, "B"))
    for _ in range(2):
        rows.append((oid := oid + 1, 1, 150.0, d1, "B"))
    out = {r["o_orderpriority"]: r for r in
           orders_price_volume_mix(spark, _orders(spark, tmp_path, rows)).collect()}
    a, b = out["A"], out["B"]
    assert a["volume_effect_cents"] == 3 * 10_000
    assert a["value_effect_cents"] == 0
    assert b["volume_effect_cents"] == 0
    assert b["value_effect_cents"] == 10_000
    for r in (a, b):
        assert (r["volume_effect_cents"] + r["value_effect_cents"]
                == r["delta_cents"])


def test_pvm_identity_on_real_data(spark):
    from etl_neotel_sql_automation_spark.workload.wave29 import (
        orders_price_volume_mix,
    )

    out = orders_price_volume_mix(spark, SF).collect()
    assert len(out) == 5
    for r in out:
        assert (r["volume_effect_cents"] + r["value_effect_cents"]
                == r["delta_cents"])


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_mlm_accounting_and_rate(spark):
    from etl_neotel_sql_automation_spark.workload.wave29 import (
        train_mlm_masking_stats,
    )

    out = train_mlm_masking_stats(spark, SF).collect()
    total_sel = sum(r["n_selected"] for r in out)
    total_tok = sum(r["n_tokens"] for r in out)
    for r in out:
        assert r["n_masked"] + r["n_random"] + r["n_kept"] == r["n_selected"]
    # 15% +- 1.5pp pooled (md5 digits are uniform)
    assert abs(total_sel / total_tok - 0.15) < 0.015
    # 80/10/10 split pooled, +- 5pp
    total_masked = sum(r["n_masked"] for r in out)
    assert abs(total_masked / total_sel - 0.8) < 0.05


def test_mlm_is_deterministic_replay(spark, tmp_path):
    """The same corpus written twice yields byte-identical audits —
    no RNG anywhere."""
    from etl_neotel_sql_automation_spark.workload.wave29 import (
        train_mlm_masking_stats,
    )

    rows = [(i, " ".join(f"t{j}" for j in range(40)), "en", f"s{i % 3}")
            for i in range(30)]
    sf1 = _docs(spark, tmp_path, rows)
    d2 = tmp_path / "d2"
    d2.mkdir()
    sf2 = _docs(spark, d2, rows)
    r1 = [tuple(r) for r in train_mlm_masking_stats(spark, sf1).collect()]
    r2 = [tuple(r) for r in train_mlm_masking_stats(spark, sf2).collect()]
    assert r1 == r2
