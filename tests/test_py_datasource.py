"""Custom Python DataSource: partitioned parallel read, schema,
determinism (two reads and any partitioning yield identical rows)."""

from __future__ import annotations


def test_synthetic_datasource_partitioned_and_deterministic(spark):
    from etl_neotel_sql_automation_spark.py_datasource import (
        SyntheticEventsDataSource,
        synth_row,
    )

    spark.dataSource.register(SyntheticEventsDataSource)

    def load(parts):
        return (
            spark.read.format("synthetic_events")
            .option("rows", 500).option("partitions", parts).option("seed", 7)
            .load()
        )

    df = load(4)
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    # the read really is split: one spark partition per InputPartition
    assert df.rdd.getNumPartitions() == 4
    rows = {tuple(r) for r in df.collect()}
    assert len(rows) == 500
    # determinism: same seed under DIFFERENT partitioning -> same rows
    assert {tuple(r) for r in load(3).collect()} == rows
    # and each row is the declared pure function of (seed, event_id)
    assert rows == {synth_row(7, i) for i in range(500)}


def test_scale_probe_ops_run_over_synthetic_events(spark):
    """The scaling probe's operator bindings (the registered queries'
    shared frames) must run over the synthetic source — keeps
    tools/scale_events_probe.py from rotting as operators evolve, and
    pins the source's events-shaped schema contract (ts included)."""
    from etl_neotel_sql_automation_spark.py_datasource import (
        SyntheticEventsDataSource,
    )
    from tools.scale_events_probe import OPS, events_at

    spark.dataSource.register(SyntheticEventsDataSource)
    ev = events_at(spark, 1).limit(2000).cache()
    try:
        for name, op in OPS.items():
            assert op(ev).count() > 0, name
    finally:
        ev.unpersist()
