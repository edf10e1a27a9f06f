"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource`` API) —
the engine's pluggable-source extension point beyond the built-in
file/Kafka formats.

The reference binds its stream to a Glue-Catalog-registered Kinesis source
(``cloudformation/template.yml:47-82``); the engine's equivalent seam for
"a source Spark doesn't ship" is this API: schema + partition planning +
per-partition iterators, all declared in Python and executed
partition-parallel by the engine (each ``InputPartition`` becomes one
Spark task — this is real parallel scan planning, not a driver-side
generator).

``SyntheticEventsDataSource`` is the deterministic reference
implementation: a seedless arithmetic telemetry generator whose rows are
a pure function of row index, so a closed-form SQL oracle can reproduce
the scan exactly — the same planted-determinism pattern the codec and
PII entries use.  A real deployment would implement ``reader()`` against
its external system (REST cursor, proprietary store, message queue) with
the identical partition-planning shape.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")``: deterministic device-telemetry rows.

    Options: ``rows`` (total row count), ``partitions`` (scan tasks).
    Row ``r`` is ``(r, r % 97, (r * 31) % 10007, IDLE|ACTIVE)`` — integer
    arithmetic only, so the scan is bit-reproducible on any cluster."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "row_id bigint, device_id bigint, metric_fp bigint, state string"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    """Plain batch reader (no pushFilters: Spark ASSERTS if a reader
    implements it while ``spark.sql.python.filterPushdown.enabled`` is
    false, so the pushdown-capable reader is a separate format —
    ``synthetic_events_pushdown`` below)."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = max(1, int(options.get("partitions", "8")))
        self.lo_bound = 0
        self.hi_bound = self.n_rows  # exclusive

    def partitions(self):
        # contiguous row ranges over the (possibly filter-narrowed)
        # bounds — each becomes one Spark task, so the scan parallelizes
        # like any file source's splits, and fully-pruned scans plan NO
        # tasks at all
        lo, hi = self.lo_bound, max(self.lo_bound, self.hi_bound)
        span = hi - lo
        if span == 0:
            return [InputPartition((lo, lo))]
        parts = min(self.n_parts, span)
        return [
            InputPartition((lo + span * i // parts, lo + span * (i + 1) // parts))
            for i in range(parts)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for r in range(lo, hi):
            yield (r, r % 97, (r * 31) % 10007, "IDLE" if r % 5 == 0 else "ACTIVE")


class SyntheticEventsPushdownReader(SyntheticEventsReader):
    """Batch reader with REAL filter pushdown: range predicates on
    ``row_id`` (the source's natural sort/partition key — a clustering
    key, file-footer min/max, or log offset in a real system) narrow the
    planned row ranges BEFORE partitioning, so pruned work never becomes
    a task (a contradiction plans an empty range).  Per the API
    contract, filters this reader CONSUMES (does not yield back) are
    fully handled by the scan; everything else (device_id predicates,
    state equality, IsNotNull) is yielded back as unsupported and Spark
    applies it post-scan.  Requires
    ``spark.sql.python.filterPushdown.enabled`` at EXECUTION time —
    Spark refuses to run a pushFilters-implementing reader with the conf
    off, which is why this lives behind its own format name instead of
    extending the default one."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        range_types = (
            GreaterThanOrEqual, GreaterThan, LessThan, LessThanOrEqual, EqualTo
        )
        # eager loop, NOT a generator: the lo/hi-bound narrowing is a side
        # effect, and a generator would only run it if the engine fully
        # consumed the returned iterator — a partially-consumed iterator
        # would silently mark filters pushed without narrowing (round-5
        # advice).  Building the unsupported list up front makes the
        # mutation unconditional.
        unsupported = []
        for f in filters:
            if (
                getattr(f, "attribute", None) == ("row_id",)
                and isinstance(f, range_types)
            ):
                v = int(f.value)
                if isinstance(f, GreaterThanOrEqual):
                    self.lo_bound = max(self.lo_bound, v)
                elif isinstance(f, GreaterThan):
                    self.lo_bound = max(self.lo_bound, v + 1)
                elif isinstance(f, LessThan):
                    self.hi_bound = min(self.hi_bound, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi_bound = min(self.hi_bound, v + 1)
                else:  # EqualTo
                    self.lo_bound = max(self.lo_bound, v)
                    self.hi_bound = min(self.hi_bound, v + 1)
                continue
            # unsupported: hand back so Spark applies it after the scan
            unsupported.append(f)
        return unsupported


class SyntheticEventsPushdownSource(SyntheticEventsDataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_pushdown"

    def reader(self, schema) -> "SyntheticEventsPushdownReader":
        return SyntheticEventsPushdownReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the custom formats on this session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticEventsPushdownSource)
    spark.dataSource.register(JsonlSinkDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch offsets over the same deterministic row space: offset =
    next row index; each trigger serves ``batch_rows`` rows until
    ``rows`` is exhausted, then reports no-data (empty iterator, same
    offset) so ``processAllAvailable`` terminates.  ``readBetweenOffsets``
    re-derives any committed range arithmetically — replay-safe with no
    buffering, because rows are a pure function of the index (the
    property a real source gets from its upstream log retention)."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.batch_rows = max(1, int(options.get("batch_rows", "250")))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        if lo >= self.n_rows:
            return iter([]), start
        hi = min(lo + self.batch_rows, self.n_rows)
        return iter(self._rows(lo, hi)), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["offset"]), int(end["offset"])))

    @staticmethod
    def _rows(lo: int, hi: int) -> list:
        # a concrete list wrapped in iter(): the simple-reader protocol
        # pickles the batch iterator driver->executor, and list iterators
        # pickle where generators cannot
        return [
            (r, r % 97, (r * 31) % 10007, "IDLE" if r % 5 == 0 else "ACTIVE")
            for r in range(lo, hi)
        ]

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: rows are derived, not buffered


class JsonlCommit(WriterCommitMessage):
    """Per-task commit message: which file this task produced and how many
    rows it holds.  Must stay picklable — it ships executor → driver."""

    def __init__(self, filename: str, n_rows: int) -> None:
        self.filename = filename
        self.n_rows = n_rows


class JsonlSinkWriter(DataSourceWriter):
    """Partition-parallel JSON-lines writer with a real two-phase commit:

    * ``write`` (executor, once per task): rows stream to a dot-prefixed
      in-progress file, atomically renamed into place only when the task
      finishes — a half-written task attempt never carries a committable
      name.  File names carry (partitionId, attemptNumber), so a retried
      task cannot collide with its failed attempt.
    * ``commit`` (driver, once per job): ONLY the files named in the
      surviving tasks' commit messages enter the ``_SUCCESS`` manifest;
      orphans from failed/speculative attempts are left behind as
      dot-files/unlisted files that manifest-driven readers never see.
      This is the Hadoop commit-protocol shape (task commit → job
      commit), which is what makes INSERT into a file sink exactly-once
      per job at 1000 executors.  The target must be shared storage on a
      real cluster (same contract as every file sink).
    """

    def __init__(self, options, schema, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires .option('path', <dir>)")
        self.path = path
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        fname = f"task-{ctx.partitionId():05d}-{ctx.attemptNumber()}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".{fname}.inprogress")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {c: row[c] for c in self.columns}, sort_keys=True
                    )
                    + "\n"
                )
                n += 1
        os.replace(tmp, os.path.join(self.path, fname))
        return JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        import json
        import os

        committed = sorted(m.filename for m in messages if m is not None)
        manifest = {
            "files": committed,
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(
            os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"
        ) as fh:
            json.dump(manifest, fh)

    def abort(self, messages) -> None:
        import os

        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    """``format("jsonl_sink")``: the WRITE side of the Python DataSource
    API (`DataSource.writer` → per-task ``DataSourceWriter.write`` →
    driver ``commit``), completing the custom-source family next to the
    batch/streaming/pushdown readers above.  A real deployment would
    target its external system (REST bulk endpoint, proprietary store)
    with the identical task-commit/job-commit shape."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlStreamSinkWriter":
        return JsonlStreamSinkWriter(self.options, schema)


def read_jsonl_sink(spark, path: str, schema):
    """Manifest-driven read-back: load ONLY the files the job commit
    recorded in ``_SUCCESS`` — uncommitted attempt output is invisible,
    which is the reader half of the exactly-once contract."""
    import json
    import os

    with open(os.path.join(path, "_SUCCESS"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    return spark.read.schema(schema).json(files)


class JsonlStreamSinkWriter(DataSourceStreamWriter):
    """Streaming face of the jsonl sink — the same task-commit protocol
    with a PER-MICRO-BATCH job commit: ``commit(messages, batchId)``
    writes ``_SUCCESS-<batchId>`` naming exactly that epoch's surviving
    task files (atomic rename, like the files themselves).  A replayed
    batch (failure recovery) writes fresh task files and OVERWRITES its
    epoch manifest, so readers never see both attempts — per-epoch
    exactly-once on an at-least-once execution substrate, the
    ``sinks/archive.py`` epoch-subdir idempotence argument expressed
    through the Spark 4 Python sink API."""

    def __init__(self, options, schema) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_sink stream writer requires .option('path', <dir>)")
        self.path = path
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        # batchId is unknown executor-side: a uuid component keeps replayed
        # attempts collision-free; the per-batch manifest is what names the
        # committed set, so file names only need uniqueness
        fname = (
            f"stream-task-{ctx.partitionId():05d}-{uuid.uuid4().hex[:8]}.jsonl"
        )
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".{fname}.inprogress")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {c: row[c] for c in self.columns}, sort_keys=True
                    )
                    + "\n"
                )
                n += 1
        os.replace(tmp, os.path.join(self.path, fname))
        return JsonlCommit(fname, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        committed = sorted(m.filename for m in messages if m is not None)
        manifest = {
            "batch_id": batchId,
            "files": committed,
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self.path, f"._SUCCESS-{batchId}.inprogress")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, f"_SUCCESS-{batchId}"))

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


def read_jsonl_stream_sink(spark, path: str, schema):
    """Read back ONLY the files named by per-batch ``_SUCCESS-<id>``
    manifests (union over epochs) — uncommitted/replaced attempt files
    are invisible, the reader half of per-epoch exactly-once."""
    import json
    import os

    files = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_SUCCESS-"):
            with open(os.path.join(path, entry), encoding="utf-8") as fh:
                manifest = json.load(fh)
            files.extend(os.path.join(path, f) for f in manifest["files"])
    return spark.read.schema(schema).json(files)
