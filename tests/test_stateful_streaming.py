"""Stateful-streaming sessionization vs the batch operator: closed
sessions emitted by the applyInPandasWithState stream must equal the
batch sessionize() sessions (except each key's final still-open one,
which only a timeout would flush)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from etl_neotel_sql_automation_spark.streaming.stateful import sessionize_stream
from etl_neotel_sql_automation_spark.workload import table


def test_streaming_sessions_match_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    batch_events = table(spark, sf, "events").filter(F.col("user_id") < 40)

    # stage events as one parquet file (user_id, us) for the stream
    staged = str(tmp_path / "events_us")
    batch_events.select(
        "user_id", F.unix_micros("ts").alias("us")
    ).coalesce(1).write.parquet(staged)

    src = spark.readStream.schema("user_id long, us long").parquet(staged)
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    streamed = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.table(name).collect()
    }

    # reconstruct (start,end) per batch session from the raw events
    from etl_neotel_sql_automation_spark.ops.asof import sessionize

    sdf = sessionize(batch_events)
    agg = sdf.groupBy("user_id", "session_id").agg(
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
        F.count("*").alias("n_events"),
    )
    rows = agg.collect()
    # drop each user's LAST session (still open in the stream)
    last = {}
    for r in rows:
        if r.user_id not in last or r.session_id > last[r.user_id]:
            last[r.user_id] = r.session_id
    batch_closed = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in rows
        if r.session_id != last[r.user_id]
    }
    assert len(batch_closed) > 0
    assert streamed == batch_closed


def test_tws_sessionize_gated_or_equivalent(spark):
    """transformWithStateInPandas twin: when protobuf is absent (this
    container) the operator must fail fast with the documented
    NotImplementedError gate BEFORE starting a stream; when protobuf
    is available it must emit exactly the GroupState twin's closed
    sessions."""
    import pytest

    from etl_neotel_sql_automation_spark.streaming.stateful import (
        run_sessionize_stream,
        run_sessionize_stream_tws,
    )

    sf = "/root/testdata/sf0.001"
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            run_sessionize_stream_tws(spark, sf)
        return
    got = {tuple(r) for r in run_sessionize_stream_tws(spark, sf).collect()}
    want = {tuple(r) for r in run_sessionize_stream(spark, sf).collect()}
    assert got == want and got
