"""Fixture tests for the wave-23 (round 6) workloads — semantics the
oracle differential cannot pin: Hamming arithmetic on hand-packed sign
patterns (identical vector -> distance 0; bitwise-complement vector ->
distance = dims; the tiebreak), the stationary distribution's analytic
fixed point on a two-state chain (pi stays put when started AT the
fixed point, mass conserved up to floor loss), and the streaming
p-chart's row-for-row equality with its batch twin (the policy test
its tripwire exclusion cites).
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def _emb(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_binary_hamming_identity_and_complement(spark, tmp_path):
    """Query 0 has pattern P; corpus vec 5 carries P exactly (distance
    0, rank 1), vec 6 carries ~P (distance 64, last), vec 7 flips one
    bit (distance 1, rank 2)."""
    from etl_neotel_sql_automation_spark.workload.wave23 import (
        emb_binary_hamming_topk,
    )

    p = [1.0 if i % 3 == 0 else -1.0 for i in range(64)]
    comp = [-x for x in p]
    one_off = list(p)
    one_off[10] = -one_off[10]
    rows = [(qid, p if qid == 0 else comp, 0) for qid in range(5)]
    rows += [(5, p, 0), (6, comp, 0), (7, one_off, 0)]
    out = [r for r in emb_binary_hamming_topk(
        spark, _emb(spark, tmp_path, rows)).collect() if r["qid"] == 0]
    assert out[0]["neighbor"] == 5 and out[0]["hamming"] == 0
    assert out[1]["neighbor"] == 7 and out[1]["hamming"] == 1
    assert out[2]["neighbor"] == 6 and out[2]["hamming"] == 64


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_markov_stationary_two_state_fixed_point(spark, tmp_path):
    """A symmetric two-state chain (A<->B with equal counts both ways)
    has stationary (1/2, 1/2) — exactly the uniform start, so three
    integer iterations keep pi at 5e11 per state, mass conserved."""
    from etl_neotel_sql_automation_spark.workload.wave23 import (
        events_markov_stationary,
    )

    t0 = datetime.datetime(2024, 1, 10)
    rows = []
    eid = 0
    # two users each alternating A,B,A,B,A -> transitions A->B x2,
    # B->A x2 per user: fully symmetric
    for uid in (1, 2):
        for i, et in enumerate(["A", "B", "A", "B", "A"]):
            rows.append(
                (eid := eid + 1, t0 + datetime.timedelta(minutes=i), uid,
                 et, 1.0)
            )
    out = {r["event_type"]: r["pi_e12"] for r in
           events_markov_stationary(spark, _events(spark, tmp_path, rows)).collect()}
    assert out == {"A": 500_000_000_000, "B": 500_000_000_000}


def test_markov_stationary_mass_conserved_on_real_data(spark):
    """Row-stochastic iteration conserves probability mass up to the
    per-(src,dst) floor loss (bounded by #transitions-pairs per
    iteration, i.e. tiny against 1e12)."""
    from etl_neotel_sql_automation_spark.workload.wave23 import (
        events_markov_stationary,
    )

    out = events_markov_stationary(spark, SF).collect()
    total = sum(r["pi_e12"] for r in out)
    assert 1_000_000_000_000 - 1_000_000 <= total <= 1_000_000_000_000
    assert all(r["pi_e12"] > 0 for r in out)  # chain is irreducible here


def test_streaming_pchart_equals_batch(spark):
    """The policy test the tripwire exclusion cites: the streaming SPC
    chart must equal the batch quality_pchart_returns row-for-row
    (same weekly state, same pooled limits — only the execution mode
    differs)."""
    from etl_neotel_sql_automation_spark.workload.wave21 import (
        quality_pchart_returns,
    )
    from etl_neotel_sql_automation_spark.workload.wave23 import (
        streaming_pchart_returns,
    )

    batch = [tuple(r) for r in quality_pchart_returns(spark, SF).collect()]
    stream = [tuple(r) for r in streaming_pchart_returns(spark, SF).collect()]
    assert stream == batch
