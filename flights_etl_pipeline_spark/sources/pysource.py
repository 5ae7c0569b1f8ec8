"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests its OLTP table over JDBC (ingestToBronze.py:43-74);
this module demonstrates the *other* way a PySpark-native engine grows a
new source: a first-class ``DataSource`` implementation registered under
``format("flights_synth")``. It generates the flight-itinerary shape
deterministically, so queries over it are oracle-checkable by replaying
the same arithmetic in SQL.

Scale: ``partitions()`` returns one ``InputPartition`` per requested
split, so the scan parallelizes across executors exactly like a JDBC
``partitionColumn`` read; each partition streams its rows, never
materializing the table on the driver.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

AIRLINES = ("AA", "DL", "UA", "WN", "B6", "AS", "NK")
_EPOCH = dt.date(2022, 4, 16)

DEFAULT_ROWS_PER_PARTITION = 1000
DEFAULT_NUM_PARTITIONS = 8

SCHEMA = (
    "leg_id BIGINT, airline STRING, fare_cents BIGINT, "
    "seats INT, search_date DATE"
)


def synth_row(i: int) -> tuple:
    """Deterministic row i of the synthetic itineraries table. The SQL
    twin of this arithmetic lives in SYNTH_SOURCE_SQL (queries_synth)."""
    return (
        i,
        AIRLINES[i % 7],
        (i * 37 + 11) % 1_000_000,
        i % 10,
        _EPOCH + dt.timedelta(days=i % 365),
    )


class FlightsSynthReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows_per_partition = int(
            options.get("rows_per_partition", DEFAULT_ROWS_PER_PARTITION)
        )
        self.num_partitions = int(
            options.get("num_partitions", DEFAULT_NUM_PARTITIONS)
        )

    def partitions(self):
        return [InputPartition(p) for p in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows_per_partition
        for j in range(self.rows_per_partition):
            yield synth_row(base + j)


class FlightsSynthSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "flights_synth"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> FlightsSynthReader:
        return FlightsSynthReader(self.options)


def _pickle_module_by_value() -> None:
    """Streaming Python data sources run in a dedicated source-runner
    process that has neither the driver's sys.path nor addPyFile's
    SparkFiles on its import path, so classes pickled BY REFERENCE to
    this module fail to deserialize there. Registering the module for
    by-value pickling makes the source self-contained wherever it lands
    (task worker, source runner, or a future connect client)."""
    import sys

    from pyspark import cloudpickle

    try:
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # older cloudpickle: batch path still works via addPyFile


def register_flights_synth(spark) -> None:
    """Idempotently register the source with this session."""
    _pickle_module_by_value()
    spark.dataSource.register(FlightsSynthSource)


class FlightsSynthStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming reader: each micro-batch serves the next
    ``chunk`` of the deterministic generator; the offset is the global
    row index, so a restart from a checkpoint resumes exactly where the
    previous run committed (no duplicates, no gaps -- the high-watermark
    pattern of ingestToBronze.py:59-66 as a first-class source)."""

    def __init__(self, options: dict) -> None:
        self.chunk = int(options.get("chunk", 2000))
        self.n_rows = int(options.get("n_rows", 8000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        s = start["i"]
        e = min(s + self.chunk, self.n_rows)
        return iter([synth_row(i) for i in range(s, e)]), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(start["i"], end["i"])])


class FlightsSynthStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "flights_synth_stream"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> FlightsSynthStreamReader:
        return FlightsSynthStreamReader(self.options)


def register_flights_synth_stream(spark) -> None:
    _pickle_module_by_value()
    spark.dataSource.register(FlightsSynthStreamSource)


# ---------------------------------------------------------------------------
# Custom Python SINK: partition-parallel JSONL writer with commit protocol
# ---------------------------------------------------------------------------


class JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    def __init__(self, file: str, n_rows: int) -> None:
        self.file = file
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    """Executor-side writer: each task streams its partition to a
    uniquely-named staged ``.jsonl.tmp`` file and reports it in a commit
    message; the driver-side ``commit`` renames every staged file into
    place and writes a ``_SUCCESS`` manifest with the total row count,
    ``abort`` deletes the staged files. That two-phase protocol is what
    makes the write atomic-per-job on task retries (a retried task
    stages a NEW uuid file; only messages from winning tasks commit) --
    the same contract FileFormatWriter implements for parquet.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        staged = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl.tmp"
        )
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommit(staged, n)

    def commit(self, messages) -> None:
        import json
        import os

        total = 0
        for m in messages:
            os.rename(m.file, m.file[: -len(".tmp")])
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"rows": total, "files": len(messages)}, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.file)
            except OSError:
                pass


class JsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options)


def register_jsonl_sink(spark) -> None:
    _pickle_module_by_value()
    spark.dataSource.register(JsonlSink)
