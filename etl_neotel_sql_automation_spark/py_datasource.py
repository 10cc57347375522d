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
    """Per-task commit message: (attempt temp path, row count,
    partition id). The temp path — never a final shard name — is what
    the task hands the driver; only driver ``commit`` publishes."""

    def __init__(self, path: str, rows: int, pid: int) -> None:
        self.path = path
        self.rows = rows
        self.pid = pid


class JsonlShardWriter(DataSourceWriter):
    """Executor-side JSONL shard writer with task-attempt isolation:
    each ATTEMPT streams its partition to a unique
    ``part-<pid>-<taskAttemptId>.jsonl.tmp`` (so a retried or
    speculative attempt can never interleave with a sibling), and the
    driver's ``commit`` atomically renames exactly one winning attempt
    per partition to ``part-<pid>.jsonl``, sweeps stray temps, and
    seals the write with a ``_MANIFEST`` listing every shard and row
    count. Readers must consume the manifest
    (:func:`read_jsonl_manifest`), not a glob: a glob can see files a
    failed job left behind; the manifest names only committed shards.
    ``abort`` removes reported temps and sweeps the rest — no partial
    attempt ever occupies a final shard name."""

    def __init__(self, path: str) -> None:
        self._path = path

    def write(self, iterator) -> JsonlShardCommit:
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f"part-{pid:05d}-{attempt}.jsonl.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlShardCommit(tmp, n, pid)

    def _sweep_tmps(self) -> None:
        import glob
        import os

        for stray in glob.glob(os.path.join(self._path, "part-*.jsonl.tmp")):
            try:
                os.remove(stray)
            except OSError:
                pass

    def commit(self, messages) -> None:
        import json
        import os

        shards = []
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self._path, f"part-{m.pid:05d}.jsonl")
            os.replace(m.path, final)  # atomic publish of the winner
            shards.append({"path": os.path.basename(final), "rows": m.rows})
        self._sweep_tmps()  # losers of speculative races / dead attempts
        manifest = {
            "shards": sorted(shards, key=lambda s: s["path"]),
            "total_rows": sum(s["rows"] for s in shards),
        }
        mtmp = os.path.join(self._path, "_MANIFEST.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(mtmp, os.path.join(self._path, "_MANIFEST.json"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        self._sweep_tmps()


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
        """Driver-side write setup. ``overwrite`` is HONORED: an
        overwrite clears prior shards and manifest before any task
        runs (so the manifest can never disagree with the directory);
        a non-overwrite write into a directory that already holds
        shards raises instead of silently mixing old and new data."""
        import glob
        import os

        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        os.makedirs(path, exist_ok=True)
        existing = glob.glob(os.path.join(path, "part-*.jsonl"))
        if overwrite:
            for f in existing:
                os.remove(f)
            mf = os.path.join(path, "_MANIFEST.json")
            if os.path.exists(mf):
                os.remove(mf)
        elif existing:
            raise ValueError(
                f"jsonl_shards: {path} already holds {len(existing)} shard(s); "
                "use .mode('overwrite') or a fresh directory"
            )
        return JsonlShardWriter(path)


def read_jsonl_manifest(spark, path: str):
    """Read back a jsonl_shards directory THROUGH ITS MANIFEST: loads
    exactly the shards the committed write sealed, never whatever a
    glob happens to see (stray files from a failed or concurrent job).
    This is the reader contract of the sink."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, s["path"]) for s in manifest["shards"]]
    return spark.read.json(files) if files else None
