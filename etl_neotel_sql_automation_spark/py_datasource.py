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
    attempt ever occupies a final shard name.

    Concurrency contract: temp names carry a per-JOB token, so the
    commit/abort sweep removes only THIS job's dead attempts — a
    concurrent job writing the same directory keeps its in-flight
    temps (final-shard publication is still last-writer-wins on
    name collisions, as with any file sink; the manifest always
    reflects the job that sealed it last).

    Overwrite contract: prior shards are NOT deleted at planning
    time. ``commit`` first publishes the new winners (same-name
    shards are atomically replaced), then removes stale shards that
    are not part of the new write, then seals the manifest — so a
    job that fails mid-run leaves the OLD dataset fully intact and
    readable through its old manifest."""

    def __init__(self, path: str, overwrite: bool = False) -> None:
        import uuid

        self._path = path
        self._overwrite = overwrite
        self._token = uuid.uuid4().hex[:12]

    def write(self, iterator) -> JsonlShardCommit:
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(
            self._path, f"part-{pid:05d}-{attempt}-{self._token}.jsonl.tmp"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlShardCommit(tmp, n, pid)

    def _sweep_tmps(self) -> None:
        """Remove THIS job's dead attempts only (the job token scopes
        the glob) — a concurrent writer's in-flight temps survive."""
        import glob
        import os

        pat = os.path.join(self._path, f"part-*-{self._token}.jsonl.tmp")
        for stray in glob.glob(pat):
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
        if self._overwrite:
            # deferred overwrite cleanup: only now that every winner is
            # published do stale shards from the PRIOR dataset go — a
            # failure anywhere above leaves the old data untouched
            import glob

            keep = {s["path"] for s in shards}
            for old in glob.glob(os.path.join(self._path, "part-*.jsonl")):
                if os.path.basename(old) not in keep:
                    try:
                        os.remove(old)
                    except OSError:
                        pass
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
        """Driver-side write setup. ``overwrite`` is HONORED but
        DEFERRED: nothing is deleted at planning time — ``commit``
        publishes the new winners first and only then removes stale
        prior shards, so a failed overwrite never destroys the old
        dataset (it stays readable through its old manifest). A
        non-overwrite write into a directory that already holds
        shards raises instead of silently mixing old and new data."""
        import glob
        import os

        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        os.makedirs(path, exist_ok=True)
        existing = glob.glob(os.path.join(path, "part-*.jsonl"))
        if not overwrite and existing:
            raise ValueError(
                f"jsonl_shards: {path} already holds {len(existing)} shard(s); "
                "use .mode('overwrite') or a fresh directory"
            )
        return JsonlShardWriter(path, overwrite=overwrite)


def read_jsonl_manifest(spark, path: str, schema=None):
    """Read back a jsonl_shards directory THROUGH ITS MANIFEST: loads
    exactly the shards the committed write sealed, never whatever a
    glob happens to see (stray files from a failed or concurrent job).
    This is the reader contract of the sink.

    Always returns a DataFrame: a committed-but-empty write (zero
    shards) yields an empty frame — from ``schema`` when given (DDL
    string or StructType), else with the manifest's recorded schema
    absent, an empty ``spark.read.json`` result. A directory with no
    manifest at all raises with the commit contract named, instead of
    a bare FileNotFoundError."""
    import json
    import os

    mf = os.path.join(path, "_MANIFEST.json")
    try:
        with open(mf) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"jsonl_shards: no _MANIFEST.json in {path} — the directory was "
            "never sealed by a committed jsonl_shards write (a failed or "
            "in-flight job leaves only part-*.jsonl.tmp attempts); only "
            "committed directories are readable through the manifest contract"
        ) from None
    files = [os.path.join(path, s["path"]) for s in manifest["shards"]]
    if files:
        return (
            spark.read.schema(schema).json(files)
            if schema is not None
            else spark.read.json(files)
        )
    if schema is not None:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame([], "corrupt_record string")
