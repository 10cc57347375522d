"""Fixture tests for the wave-34 (round 7) Markov removal-effect
attribution — chains small enough to solve by hand, pinning the
journey construction, the absorbing-chain fixpoint, the removal
semantics, and the floor-division attribution (the differential
can't catch a formula transcribed identically wrong on both
engines).
"""

from __future__ import annotations

import datetime


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _t(i):
    return datetime.datetime(2024, 1, 1, 0, i)


def _rows_for(user, journey, start_id):
    return [
        (start_id + k, _t(k), user, ev, 0.0, "{}")
        for k, ev in enumerate(journey)
    ]


def test_single_channel_chain_closed_form(spark, tmp_path):
    """10 users: 5x view->purchase, 5x view->end. T(start->view)=1,
    T(view->conv)=0.5 => P(full)=500000; removing view kills all
    conversion (effect 500000, share 1e6, 5 of 5 conversions);
    removing an untouched channel changes nothing."""
    from etl_neotel_sql_automation_spark.workload.wave34 import (
        events_markov_attribution,
    )

    rows = []
    for u in range(5):
        rows += _rows_for(u, ["view", "purchase"], 100 * u)
    for u in range(5, 10):
        rows += _rows_for(u, ["view"], 100 * u)
    res = {
        r["channel"]: r
        for r in events_markov_attribution(
            spark, _events(spark, tmp_path, rows)
        ).collect()
    }
    v = res["view"]
    assert v["p_full_ppm"] == 500_000
    assert v["removal_p_ppm"] == 0
    assert v["effect_ppm"] == 500_000
    assert v["share_ppm"] == 1_000_000
    assert v["attributed_conv"] == 5
    for ch in ("click", "signup", "error"):
        assert res[ch]["effect_ppm"] == 0
        assert res[ch]["removal_p_ppm"] == 500_000
        assert res[ch]["attributed_conv"] == 0


def test_two_hop_chain_and_floor_attribution(spark, tmp_path):
    """User A: click->view->purchase; user B: click->end.
    T(click->view)=0.5, T(view->conv)=1 => P(full)=500000. Removing
    EITHER channel zeroes conversion, so both effects are 500000 and
    the single conversion floor-divides to 0 attributed per channel
    (shares 500000 each) — the documented integer semantics."""
    from etl_neotel_sql_automation_spark.workload.wave34 import (
        events_markov_attribution,
    )

    rows = _rows_for(0, ["click", "view", "purchase"], 0)
    rows += _rows_for(1, ["click"], 100)
    res = {
        r["channel"]: r
        for r in events_markov_attribution(
            spark, _events(spark, tmp_path, rows)
        ).collect()
    }
    for ch in ("click", "view"):
        assert res[ch]["p_full_ppm"] == 500_000
        assert res[ch]["removal_p_ppm"] == 0
        assert res[ch]["effect_ppm"] == 500_000
        assert res[ch]["share_ppm"] == 500_000
        assert res[ch]["attributed_conv"] == 0


def test_self_loop_reaches_integer_fixpoint(spark, tmp_path):
    """One journey view->view->purchase: T(view->view)=0.5,
    T(view->conv)=0.5. The exact fixpoint is 1.0; the floor-division
    iteration converges to 999999 ppm well within K=40 — pinning both
    the iteration count and the rounding mode."""
    from etl_neotel_sql_automation_spark.workload.wave34 import (
        events_markov_attribution,
    )

    rows = _rows_for(0, ["view", "view", "purchase"], 0)
    res = {
        r["channel"]: r
        for r in events_markov_attribution(
            spark, _events(spark, tmp_path, rows)
        ).collect()
    }
    assert res["view"]["p_full_ppm"] == 999_999
    assert res["view"]["effect_ppm"] == 999_999
    assert res["view"]["share_ppm"] == 1_000_000
    assert res["view"]["attributed_conv"] == 1  # 1 * 999999 // 999999


def test_zero_touch_converter_counts(spark, tmp_path):
    """A user whose first event is the purchase contributes
    start->conv directly: P(full) > 0 but no channel has any effect,
    so shares are NULL (sum of effects is 0) — the degenerate-chain
    guard."""
    from etl_neotel_sql_automation_spark.workload.wave34 import (
        events_markov_attribution,
    )

    rows = _rows_for(0, ["purchase"], 0)
    res = events_markov_attribution(
        spark, _events(spark, tmp_path, rows)
    ).collect()
    assert len(res) == 4
    for r in res:
        assert r["p_full_ppm"] == 1_000_000
        assert r["effect_ppm"] == 0
        assert r["share_ppm"] is None
        assert r["attributed_conv"] is None
