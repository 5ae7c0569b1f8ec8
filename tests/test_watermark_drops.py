"""Watermark discipline: late rows are excluded, and the exclusion is
observable.

At scale, watermarking is what bounds streaming state; the contract is
that rows arriving after the watermark has passed their event time
never reach the append-mode aggregate's output, and the drop is
monitorable (watermark advance + numRowsDroppedByWatermark in progress
events). One nuance pinned here: Spark applies TWO layers — an eager
pre-filter (uncounted) and the state operator's own late-row drop
(counted) — so the metric is a lower bound; the OUTPUT is the contract.

Also pinned: the watermark lags one batch (batch N filters with the
watermark computed from batch N-1's data), which is why the late file
arrives two batches after the fresh data here, and why AvailableNow
runs a final empty batch to flush windows the last watermark advance
closed.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ts STRING, user_id LONG").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )


def test_late_rows_never_reach_append_output(spark, tmp_path):
    src = str(tmp_path / "late_src")
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
        ]
    )
    files = [
        # fresh: advances the watermark to 09:59 after batch 0
        _mk(spark, [("2024-01-01 10:%02d:00" % m, 1) for m in range(10)]),
        # more fresh: watermark reaches 10:44 after batch 1
        _mk(spark, [("2024-01-01 10:5%d:00" % m, 1) for m in range(5)]),
        # HOURS-late rows, filtered against watermark 10:44
        _mk(spark, [("2024-01-01 06:00:00", 2), ("2024-01-01 06:30:00", 2)]),
        # on-time rows that push the watermark past 11:00 so the
        # hour-10 window closes and emits
        _mk(spark, [("2024-01-01 12:%02d:00" % m, 3) for m in range(3)]),
    ]
    # the file source triggers oldest-modification-first; pin mtimes
    gens = []
    for df in files:
        before = (
            set(glob.glob(os.path.join(src, "*.parquet")))
            if os.path.exists(src)
            else set()
        )
        df.coalesce(1).write.mode("append").parquet(src)
        gens.append(set(glob.glob(os.path.join(src, "*.parquet"))) - before)
    now = time.time()
    for i, gen in enumerate(gens):
        for f in gen:
            os.utime(f, (now + 60 * i, now + 60 * i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_wm_")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_drops")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progress = q.recentProgress
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    # every file became its own bounded batch, in arrival order
    assert [p["numInputRows"] for p in progress if p["numInputRows"]] == [
        10,
        5,
        2,
        3,
    ]
    # the state operator observed (at least one of) the late rows drop
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in progress
        for op in p["stateOperators"]
    )
    assert dropped >= 1
    # the contract: only on-time windows emit — hour 10 with exactly the
    # 15 on-time rows; the late hour-6 rows appear nowhere
    out = {r["window"].start.hour: r["n"] for r in
           spark.table("wm_drops").collect()}
    assert out.get(10) == 15
    assert 6 not in out
