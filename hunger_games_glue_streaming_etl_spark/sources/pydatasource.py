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
    InputPartition,
    SimpleDataSourceStreamReader,
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
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = max(1, int(options.get("partitions", "8")))

    def partitions(self):
        # contiguous row ranges — each becomes one Spark task, so the
        # scan parallelizes like any file source's splits
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        i = partition.value
        lo = self.n_rows * i // self.n_parts
        hi = self.n_rows * (i + 1) // self.n_parts
        for r in range(lo, hi):
            yield (r, r % 97, (r * 31) % 10007, "IDLE" if r % 5 == 0 else "ACTIVE")


def register_synthetic_source(spark) -> None:
    """Idempotently register the custom format on this session."""
    spark.dataSource.register(SyntheticEventsDataSource)


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
