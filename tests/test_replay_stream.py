"""Replay driver + streaming shell: checkpoint resume, crash recovery."""

from __future__ import annotations

import pytest

from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state
from mimic_iv_etl_spark.cdc.replay import replay_log
from mimic_iv_etl_spark.cdc.stream import stream_log
from mimic_iv_etl_spark.lake.table import LakeTable
from tests.util import TRANSCRIPT_SCHEMA, assert_final_state_equal


def test_replay_full_log(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tp = str(tmp_path / "t")
    out = replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA,
                     batch_offsets=500, n_buckets=8)
    assert out["events_applied"] == spec.n_events
    assert out["batches"] >= 4
    assert_final_state_equal(LakeTable(spark, tp).read(), duckdb_final_state(d))


def test_replay_resume_skips_applied_windows(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tp = str(tmp_path / "t2")
    replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA, batch_offsets=500, n_buckets=8)
    # second replay of the same log: every window fully applied → pure
    # metadata skips, zero events, zero data commits
    tbl = LakeTable(spark, tp)
    v = tbl.version
    out = replay_log(spark, d, tp, batch_offsets=500)
    assert out["events_applied"] == 0
    assert out["batches"] == 0
    assert out["skipped_windows"] > 0
    assert LakeTable(spark, tp).version == v
    assert_final_state_equal(LakeTable(spark, tp).read(), duckdb_final_state(d))


def test_replay_evolved_log_with_compaction(spark, evolved_log, tmp_path):
    d, spec, _ = evolved_log
    tp = str(tmp_path / "t3")
    out = replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA,
                     batch_offsets=400, n_buckets=8, compact_every=2)
    assert out["events_applied"] == spec.n_events
    tbl = LakeTable(spark, tp)
    assert [f.name for f in tbl.schema.fields][-2:] == ["tool_version", "latency_ms"]
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_stream_log_end_to_end(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tp = str(tmp_path / "t4")
    table = stream_log(spark, d, tp, str(tmp_path / "ckpt4"),
                       schema=TRANSCRIPT_SCHEMA, n_buckets=8)
    assert sum(table.applied_offsets.values()) + len(table.applied_offsets) == spec.n_events
    assert_final_state_equal(table.read(), duckdb_final_state(d))


def test_stream_crash_and_resume_exactly_once(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tp = str(tmp_path / "t5")
    ckpt = str(tmp_path / "ckpt5")

    class Boom(Exception):
        pass

    def crash_after_two(epoch_id, stats):
        if epoch_id >= 2:
            raise Boom("injected crash mid-stream")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((Boom, StreamingQueryException)):
        stream_log(spark, d, tp, ckpt, schema=TRANSCRIPT_SCHEMA, n_buckets=8,
                   on_batch=crash_after_two)

    applied_mid = LakeTable(spark, tp).applied_offsets
    assert sum(applied_mid.values()) >= 0  # some progress committed

    # restart from the same checkpoint: re-delivered batch no-ops, rest applies
    table = stream_log(spark, d, tp, ckpt)
    assert_final_state_equal(table.read(), duckdb_final_state(d))
