"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-events generator.

The reference pulls its input from a bespoke out-of-engine extractor
(SURVEY §2.1: portal download into a landing dir). On Spark the
idiomatic wrapper for ANY bespoke source — an internal API, a queue, a
generator — is the Python DataSource API: declare a schema, split the
read into :class:`InputPartition` units, and each executor pulls only
its partition, so a custom source scales exactly like a parquet scan
instead of funneling through the driver.

This instance generates a seeded synthetic event stream (the shape of
the ``events`` table) for soak-testing landings and benchmarking
without moving data. Rows are a pure function of (seed, event_id) via
md5, so every read — any partitioning, any engine, any retry —
produces the identical dataset: the same determinism contract as the
engine's sampling/split operators.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 10_000).option("partitions", 8).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta

try:  # Spark >= 4 only; import-gated like the other optional surfaces
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
except ImportError as e:  # pragma: no cover
    raise NotImplementedError(f"Python DataSource API requires Spark 4: {e}") from e

_EVENT_TYPES = ("view", "click", "signup", "purchase")
_EPOCH = datetime(2024, 1, 1)


def synth_row(
    seed: int, event_id: int, users: int = 1000, days: int = 30
) -> tuple[int, datetime, int, str, float]:
    """The one row (seed, event_id, users, days) maps to — shared by
    the executor read path and tests so determinism is asserted against
    the same function the source runs. ``ts`` spreads uniformly over
    ``days`` from 2024-01-01 (microsecond grain, from independent md5
    bits), matching the testdata events profile so the window/state
    operators see realistic per-user event streams."""
    hx = hashlib.md5(f"{seed}:{event_id}".encode()).hexdigest()
    h = int(hx[:15], 16)
    h2 = int(hx[15:30], 16)
    # event_type comes from hash bits INDEPENDENT of the user_id bits:
    # h % users and h % 4 are correlated whenever users % 4 == 0 (each
    # user would get exactly one event type forever — no user could
    # ever signup AND purchase, silently zeroing funnel-style joins)
    return (
        event_id,
        _EPOCH + timedelta(microseconds=h2 % (days * 86_400_000_000)),
        h % users,
        _EVENT_TYPES[int(hx[30:32], 16) % len(_EVENT_TYPES)],
        (h // 7) % 10_000 / 100.0,
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.users = int(options.get("users", 1000))
        self.days = int(options.get("days", 30))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        lo = i * self.rows // self.n_partitions
        hi = (i + 1) * self.rows // self.n_partitions
        for eid in range(lo, hi):
            yield synth_row(self.seed, eid, self.users, self.days)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)
