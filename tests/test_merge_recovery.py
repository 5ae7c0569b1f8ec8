"""Crash recovery for stream_merge_upsert's two-rename state swap: a
crash between (state -> .old-N) and (.staging-N -> state) must not lose
previously merged state (round-4 ADVICE item). Covers the orphan-restore
helper directly and the end-to-end replay-after-crash contract."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from flights_etl_pipeline_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def _write_rows(spark, path: str, vals: list[int]) -> None:
    spark.range(0).sparkSession.createDataFrame(
        [(v,) for v in vals], "v int"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _read_vals(spark, path: str) -> set[int]:
    return {r["v"] for r in spark.read.parquet(path).collect()}


def test_recover_picks_newest_and_prefers_staging(spark, tmp_path):
    state = str(tmp_path / "state")
    # crash window at batch 4: old-3 (two batches stale), old-4 (the
    # pre-merge generation), staging-4 (the post-merge generation)
    _write_rows(spark, state + ".old-3", [3])
    _write_rows(spark, state + ".old-4", [4])
    _write_rows(spark, state + ".staging-4", [44])
    jobs._recover_state_dir(state)
    assert _read_vals(spark, state) == {44}
    # losing orphans are cleared so crash debris never accumulates
    leftovers = [d for d in os.listdir(tmp_path) if d != "state"]
    assert leftovers == []


def test_recover_ignores_incomplete_orphans(spark, tmp_path):
    state = str(tmp_path / "state")
    _write_rows(spark, state + ".old-7", [7])
    # a HIGHER-numbered staging dir without _SUCCESS (crash mid-write)
    # must not win over the complete older generation
    _write_rows(spark, state + ".staging-8", [8])
    os.remove(os.path.join(state + ".staging-8", "_SUCCESS"))
    jobs._recover_state_dir(state)
    assert _read_vals(spark, state) == {7}


def test_recover_noop_when_state_complete(spark, tmp_path):
    state = str(tmp_path / "state")
    _write_rows(spark, state, [1])
    _write_rows(spark, state + ".old-2", [2])
    jobs._recover_state_dir(state)
    assert _read_vals(spark, state) == {1}
    # a complete state_dir means the swap finished; orphans are the
    # swap's own cleanup problem, not recovery's
    assert os.path.isdir(state + ".old-2")


def test_crash_between_renames_then_replay_converges(spark):
    """End-to-end: drain once, simulate the exact crash window (state
    renamed away, next-gen staging never landed), re-drain from a fresh
    checkpoint. Recovery restores the orphan and the idempotent per-key
    max merge converges to the same final state instead of losing the
    pre-crash generations."""
    out = f"/tmp/spark_graft_tests/recov-{uuid.uuid4().hex[:8]}"
    try:
        jobs.stream_merge_upsert(spark, SF, out)
        state = os.path.join(out, "state")
        want = {
            (r["user_id"], r["event_type"]): (
                r["latest_ts"],
                r["latest_event_id"],
                r["latest_value"],
            )
            for r in spark.read.parquet(state).collect()
        }
        assert want
        # the crash window: state was renamed to .old-N, staging never
        # replaced it
        os.replace(state, state + ".old-999")
        jobs.stream_merge_upsert(spark, SF, out)
        got = {
            (r["user_id"], r["event_type"]): (
                r["latest_ts"],
                r["latest_event_id"],
                r["latest_value"],
            )
            for r in spark.read.parquet(state).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)
