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
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )
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


class JsonlShardCommit(WriterCommitMessage):
    """Per-task commit message: (shard path, row count)."""

    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class JsonlShardWriter(DataSourceWriter):
    """Executor-side JSONL shard writer: each task streams its
    partition to one ``part-<id>.jsonl`` file — no driver funnel —
    and the driver's ``commit`` seals the write with a ``_MANIFEST``
    listing every shard and row count (the poor-man's atomic commit:
    readers that require the manifest never see a partial write;
    ``abort`` removes any shards that did report success)."""

    def __init__(self, path: str) -> None:
        self._path = path

    def write(self, iterator) -> JsonlShardCommit:
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._path, exist_ok=True)
        shard = os.path.join(self._path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(shard, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlShardCommit(shard, n)

    def commit(self, messages) -> None:
        import json
        import os

        shards = [
            {"path": os.path.basename(m.path), "rows": m.rows}
            for m in messages
            if m is not None
        ]
        manifest = {
            "shards": sorted(shards, key=lambda s: s["path"]),
            "total_rows": sum(s["rows"] for s in shards),
        }
        with open(os.path.join(self._path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlShardsDataSource(DataSource):
    """Write-side Python DataSource (the reader twin is
    SyntheticEventsDataSource): ``df.write.format("jsonl_shards")``
    streams every partition to a JSONL shard executor-side — the
    wrapper shape for bespoke sinks (a feed, an API, a queue) that
    must scale like a file sink rather than collect through the
    driver. JSONL is the interchange format the training-data world
    actually ships, and the corpus reader half already exists
    (io_sources.read_jsonl_docs)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        return JsonlShardWriter(path)
