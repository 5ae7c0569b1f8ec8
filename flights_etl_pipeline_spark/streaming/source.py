"""File-stream source scaffolding for the events table.

A Structured Streaming file source replays a directory of files as
micro-batches (``maxFilesPerTrigger=1``), which is what lets watermarks
*advance between batches* — the thing a single-file replay cannot
exercise. ``prepare_stream_dir`` materializes the driver's
``events.parquet`` into N chronological chunk files plus optional
far-future "sentinel" files whose only job is to push the event-time
watermark past every real timer so append-mode windows close and
stateful timeouts fire before the AvailableNow trigger stops the query.

This prep step is test scaffolding (a production deployment reads a real
file/Kafka stream); the jobs in ``streaming.jobs`` are the product. Chunk
assignment is pure column arithmetic over (min_ts, max_ts) — no global
window — so the prep itself stays scale-clean.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flights_etl_pipeline_spark.plans.registry import load

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# sentinel rows: negative user_id, filtered from every job's output
SENTINEL_USER = -1
SENTINEL_OFFSETS = (timedelta(days=30), timedelta(days=60))

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRATCH_ROOT = os.path.join(_REPO_DIR, ".scratch", "streams")


def _move_single_part(staging: str, dest: str) -> None:
    parts = [f for f in os.listdir(staging) if f.endswith(".parquet")]
    assert len(parts) == 1, f"expected one part file in {staging}: {parts}"
    shutil.move(os.path.join(staging, parts[0]), dest)
    shutil.rmtree(staging, ignore_errors=True)


def prepare_stream_dir(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 4,
    sentinels: bool = False,
) -> tuple[str, int]:
    """Materialize events as chronological chunk files for replay.

    Returns ``(stream_dir, max_real_ts_us)``. Idempotent: reuses the
    directory when its ``_PREPARED`` marker exists. File modification
    times are pinned to an increasing sequence so the file source's
    oldest-first ordering is deterministic.
    """
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    variant = f"c{n_chunks}" + ("s2" if sentinels else "")
    stream_dir = os.path.join(SCRATCH_ROOT, sf_name, variant)
    marker = os.path.join(stream_dir, "_PREPARED")
    if os.path.exists(marker):
        with open(marker) as fh:
            return stream_dir, json.load(fh)["max_ts_us"]

    shutil.rmtree(stream_dir, ignore_errors=True)
    os.makedirs(stream_dir, exist_ok=True)

    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    lo_us, hi_us = (
        ev.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
        .collect()[0][0:2]
    )
    span = max(hi_us - lo_us + 1, 1)
    chunk = F.least(
        F.lit(n_chunks - 1),
        ((F.unix_micros("ts") - F.lit(lo_us)) * n_chunks / F.lit(span)).cast("int"),
    )
    ev = ev.withColumn("_chunk", chunk)

    files: list[str] = []
    for i in range(n_chunks):
        staging = os.path.join(stream_dir, f"_staging_{i}")
        (
            ev.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(staging)
        )
        dest = os.path.join(stream_dir, f"chunk-{i:04d}.parquet")
        _move_single_part(staging, dest)
        files.append(dest)

    if sentinels:
        from datetime import datetime, timezone

        hi_dt = datetime.fromtimestamp(hi_us / 1e6, tz=timezone.utc).replace(tzinfo=None)
        for j, off in enumerate(SENTINEL_OFFSETS):
            row = [(-1000 - j, hi_dt + off, SENTINEL_USER, "__sentinel__", 0.0, None)]
            staging = os.path.join(stream_dir, f"_staging_s{j}")
            (
                spark.createDataFrame(row, EVENTS_SCHEMA)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(staging)
            )
            dest = os.path.join(stream_dir, f"sentinel-{j:04d}.parquet")
            _move_single_part(staging, dest)
            files.append(dest)

    # pin mtimes: file source processes oldest-first; make that order
    # exactly chunk order regardless of write timing granularity
    base = 1_000_000_000
    for i, path in enumerate(files):
        os.utime(path, (base + i * 60, base + i * 60))

    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as fh:
        json.dump({"max_ts_us": hi_us, "files": [os.path.basename(f) for f in files]}, fh)
    os.replace(tmp_marker, marker)
    return stream_dir, hi_us


def read_event_stream(
    spark: SparkSession, stream_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the prepared chunk directory, one file per batch."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(stream_dir)
    )


# ---------------------------------------------------------------------------
# Documents file stream (corpus-curation streaming twin)
# ---------------------------------------------------------------------------

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def prepare_docs_stream_dir(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> str:
    """Materialize documents as N chunk files for micro-batch replay.

    Chunk assignment is ``doc_id % n_chunks`` — pure column arithmetic,
    no ordering requirement (the consuming jobs are stateless per-row
    maps, so batch boundaries cannot change any output value). Same
    idempotent marker/mtime discipline as the events prep."""
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    stream_dir = os.path.join(SCRATCH_ROOT, sf_name, f"docs_c{n_chunks}")
    marker = os.path.join(stream_dir, "_PREPARED")
    if os.path.exists(marker):
        return stream_dir

    shutil.rmtree(stream_dir, ignore_errors=True)
    os.makedirs(stream_dir, exist_ok=True)

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    files: list[str] = []
    for i in range(n_chunks):
        staging = os.path.join(stream_dir, f"_staging_{i}")
        (
            docs.filter(F.col("doc_id") % n_chunks == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(staging)
        )
        dest = os.path.join(stream_dir, f"chunk-{i:04d}.parquet")
        _move_single_part(staging, dest)
        files.append(dest)

    base = 1_000_000_000
    for i, path in enumerate(files):
        os.utime(path, (base + i * 60, base + i * 60))

    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as fh:
        json.dump({"files": [os.path.basename(f) for f in files]}, fh)
    os.replace(tmp_marker, marker)
    return stream_dir


def read_docs_stream(
    spark: SparkSession, stream_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the prepared documents chunk directory."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(stream_dir)
    )
