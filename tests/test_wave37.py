"""Fixture tests for the wave-37 (round 7) tuning tables — the
cumulative-retention identities and padding accounting checked on
hand-built corpora (both engines share the formulas; only a fixture
can catch an off-by-one in the reverse-cumulative window or the
bucket boundaries).
"""

from __future__ import annotations


def _docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_gate_sweep_retention_identities(spark, tmp_path):
    """Three score levels (0, 500000, 1e6 ppm) with known token
    counts: the lowest threshold retains everything; each row's
    retained counts equal the hand-summed tail; shares are exact."""
    from etl_neotel_sql_automation_spark.workload.wave37 import (
        quality_gate_sweep,
    )

    texts = (
        ["alpha beta gamma delta"] * 4  # score 0, 4 tokens
        + ["the zq the zq"] * 2  # score 500000, 4 tokens
        + [" ".join(["the"] * 10)]  # score 1e6, 10 tokens
    )
    rows = quality_gate_sweep(spark, _docs(spark, tmp_path, texts)).collect()
    by_t = {r["threshold_ppm"]: r for r in rows}
    assert set(by_t) == {0, 500_000, 900_000}
    assert by_t[0]["docs_retained"] == 7
    assert by_t[0]["tokens_retained"] == 4 * 4 + 2 * 4 + 10
    assert by_t[0]["docs_share_ppm"] == 1_000_000
    assert by_t[500_000]["docs_retained"] == 3
    assert by_t[500_000]["tokens_retained"] == 18
    assert by_t[900_000]["docs_retained"] == 1
    assert by_t[900_000]["tokens_retained"] == 10
    assert by_t[900_000]["mean_score_ppm"] == 1_000_000
    # mean over the >=500000 tail: (2*500000 + 1e6) / 3
    assert by_t[500_000]["mean_score_ppm"] == 2_000_000 // 3


def test_length_bucket_padding_accounting(spark, tmp_path):
    """Docs of 10, 64, 65 and 600 tokens: buckets 64/64/128/512; the
    600-token doc truncates to 512 (zero padding); identities
    bucketed_waste < unbucketed_waste and exact padded counts."""
    from etl_neotel_sql_automation_spark.workload.wave37 import (
        train_length_bucket_padding,
    )

    texts = [
        " ".join(["w"] * 10),
        " ".join(["w"] * 64),
        " ".join(["w"] * 65),
        " ".join(["w"] * 600),
    ]
    rows = train_length_bucket_padding(
        spark, _docs(spark, tmp_path, texts)
    ).collect()
    by_b = {r["bucket"]: r for r in rows}
    assert set(by_b) == {64, 128, 512}
    assert by_b[64]["n_docs"] == 2
    assert by_b[64]["padded_tokens"] == 54  # 64-10 + 64-64
    assert by_b[128]["padded_tokens"] == 63
    assert by_b[512]["padded_tokens"] == 0  # truncated to 512 exactly
    # pooled: bucketed pads 117 of 64*2+128+512; pad-to-512 pads
    # 4*512 - (10+64+65+512)
    pooled = rows[0]
    assert pooled["bucketed_waste_ppm"] == (1_000_000 * 117) // 768
    assert pooled["unbucketed_waste_ppm"] == (
        1_000_000 * (2048 - 651)
    ) // 2048
    assert pooled["bucketed_waste_ppm"] < pooled["unbucketed_waste_ppm"]
