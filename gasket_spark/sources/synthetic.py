"""A Python DataSource: deterministic synthetic events, batch +
streaming, with filter pushdown.

This is the engine's connector-authoring surface — the gasket analog
is a source *command stage* (a process that emits records,
/root/reference/index.js:14-27), lifted to Spark's DataSource V2
Python API (pyspark.sql.datasource, new in Spark 4): when a feed has
no JVM connector, a pure-Python reader slots into the SAME scan
machinery — partition planning on the driver, per-partition reads on
executors (Arrow-batched), pushed filters applied at the source.

Everything is DETERMINISTIC (row i is a pure function of i), so tests
can assert exact contents, repeated reads are identical, and the
streaming reader's offset log replays losslessly.
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, EqualTo, InputPartition,
    SimpleDataSourceStreamReader,
)

_TYPES = ("view", "click", "purchase", "signup", "error")
# timezone-AWARE base: a naive datetime would be interpreted in the
# Python worker's process-local zone, shifting the stored instant
# whenever the host TZ isn't UTC (caught by the TZ-shifted selfcheck)
_BASE_TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
           "event_type string, value double")


def _row(i: int):
    """Row i as a pure function of i (xorshift-free integer mix)."""
    return (
        i,
        _BASE_TS + datetime.timedelta(seconds=i * 7),
        (i * 2654435761) % 150,
        _TYPES[i % len(_TYPES)],
        ((i * 1103515245 + 12345) % 1_000_000) / 10_000.0,
    )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("gasket_synthetic")`` — options:
    ``rows`` (total, default 1000), ``partitions`` (default 4),
    streaming ``rowsPerBatch`` (default 100)."""

    @classmethod
    def name(cls) -> str:
        return "gasket_synthetic"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SyntheticBatchReader":
        return SyntheticBatchReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticStreamReader":
        return SyntheticStreamReader(self.options)


class SyntheticBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.uid_filter: int | None = None

    def pushFilters(self, filters):
        """Absorb user_id equality filters; everything else stays in
        the Spark plan. Pushdown here means the generator SKIPS
        non-matching rows at the source — for a real remote feed, the
        predicate travels into the upstream query."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("user_id",):
                self.uid_filter = f.value
            else:
                yield f

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition):
        per = -(-self.n_rows // self.n_parts)  # ceil
        lo = partition.value * per
        for i in range(lo, min(lo + per, self.n_rows)):
            r = _row(i)
            if self.uid_filter is not None and r[2] != self.uid_filter:
                continue
            yield r


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offset = next row index; each micro-batch serves a bounded
    slice, so replay from any committed offset regenerates the exact
    rows (deterministic source ⇒ exactly-once on retry)."""

    def __init__(self, options):
        self.per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = lo + self.per_batch
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start, end):
        return iter([_row(i) for i in range(start["i"], end["i"])])


# ---------------------------------------------------------------------------
# Python DataSource WRITER: NDJSON sink with a commit protocol
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter, DataSourceWriter, WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    temp_path: str
    final_path: str
    n_rows: int


class NdjsonSinkDataSource(DataSource):
    """``df.write.format("gasket_ndjson_sink").option("path", dir)`` —
    a pure-Python NDJSON sink with the two-phase commit every real
    sink needs: each task writes to a UNIQUE temp file and reports it
    in its commit message; only the DRIVER's commit() renames temp
    files into place (and abort() deletes them) — so a failed or
    speculatively-retried task can never leave a partial file visible.
    The same protocol is what makes object-store sinks exactly-once
    at 100 TB; here it is observable and testable locally."""

    @classmethod
    def name(cls) -> str:
        return "gasket_ndjson_sink"

    def writer(self, schema, overwrite: bool) -> "NdjsonWriter":
        return NdjsonWriter(self.options["path"],
                            [f.name for f in schema.fields])

    def streamWriter(self, schema, overwrite: bool) -> "NdjsonStreamWriter":
        return NdjsonStreamWriter(self.options["path"],
                                  [f.name for f in schema.fields])


class NdjsonWriter(DataSourceWriter):
    def __init__(self, path: str, cols: list[str]):
        self.path = path
        self.cols = cols

    def write(self, rows) -> _FileCommit:
        _os.makedirs(self.path, exist_ok=True)
        uid = _uuid.uuid4().hex
        temp = _os.path.join(self.path, f"._tmp_{uid}.ndjson")
        final = _os.path.join(self.path, f"part-{uid}.ndjson")
        n = 0
        with open(temp, "w") as f:
            for row in rows:
                f.write(_json.dumps(
                    dict(zip(self.cols, row)), default=str) + "\n")
                n += 1
        return _FileCommit(temp, final, n)

    def commit(self, messages) -> None:
        for m in messages:
            _os.replace(m.temp_path, m.final_path)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                _os.remove(m.temp_path)
            except FileNotFoundError:
                pass


class NdjsonStreamWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`NdjsonWriter` —
    ``df.writeStream.format("gasket_ndjson_sink")`` — with the
    IDEMPOTENT per-micro-batch commit that upgrades a restart-replayed
    (at-least-once) micro-batch to exactly-once output: tasks write
    unique temp files, and the driver's ``commit(batch_id)`` renames
    them to names DETERMINISTIC in (batch_id, partition_id), so a
    replay of batch N overwrites batch N's own files instead of
    duplicating them. This file-naming contract is the same one
    Spark's own file sink relies on; here it's pure Python and the
    replay test can watch it happen."""

    def __init__(self, path: str, cols: list[str]):
        self.path = path
        self.cols = cols

    def write(self, rows) -> _FileCommit:
        from pyspark import TaskContext

        _os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        uid = _uuid.uuid4().hex
        temp = _os.path.join(self.path, f"._tmp_{uid}.ndjson")
        n = 0
        with open(temp, "w") as f:
            for row in rows:
                f.write(_json.dumps(
                    dict(zip(self.cols, row)), default=str) + "\n")
                n += 1
        # final name is completed by commit() once batch_id is known
        return _FileCommit(temp, f"{pid:05d}", n)

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            final = _os.path.join(
                self.path, f"part-{batchId:09d}-{m.final_path}.ndjson")
            _os.replace(m.temp_path, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                _os.remove(m.temp_path)
            except FileNotFoundError:
                pass
