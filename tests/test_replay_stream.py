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


def test_stream_micro_batches_run_locator_kernel(spark, small_log, tmp_path,
                                                 monkeypatch):
    """VERDICT r03 item 2 (streaming locator parity): each foreachBatch
    micro-batch must derive dense ranges from the manifest's per-file offsets
    and run the packed-stamp locator kernel — a HashAggregate plan with no
    SortAggregate — exactly like batch replay, with the arithmetic offset
    bookkeeping (no Observation on the hot path)."""
    import mimic_iv_etl_spark.cdc.apply as apply_mod
    from mimic_iv_etl_spark.lake.merge import lww_winner_locators as real

    plans: list[str] = []

    def spy(candidates, key_cols):
        out = real(candidates, key_cols)
        plans.append(out._jdf.queryExecution().executedPlan().toString())
        return out

    monkeypatch.setattr(apply_mod, "lww_winner_locators", spy)

    modes: list[str] = []
    d, spec, _ = small_log
    tp = str(tmp_path / "t_loc_stream")
    table = stream_log(
        spark, d, tp, str(tmp_path / "ckpt_loc"), schema=TRANSCRIPT_SCHEMA,
        n_buckets=8, on_batch=lambda e, s: modes.append(s["dedup_mode"]))
    assert modes and all(m == "locator" for m in modes), modes
    assert plans and all(
        "HashAggregate" in p and "SortAggregate" not in p for p in plans)
    assert_final_state_equal(table.read(), duckdb_final_state(d))


def test_stream_locator_with_many_source_partitions(spark, tmp_path):
    """Streaming counterpart of the >64-partition batch test (VERDICT r04
    item 1): an 80-partition Kafka-style log must keep every micro-batch on
    the locator fast path — the bitmap probe's broadcast lookup arrays are
    partition-count-independent on the streaming side too."""
    from mimic_iv_etl_spark.cdc.changelog import ChangeLogSpec, generate_change_log

    d = str(tmp_path / "log_manyparts_s")
    spec = ChangeLogSpec(n_events=8_000, n_convs=250, n_partitions=80,
                         seed=12)
    generate_change_log(d, spec)
    modes: list[str] = []
    tp = str(tmp_path / "t_manyparts_s")
    table = stream_log(
        spark, d, tp, str(tmp_path / "ckpt_manyparts"),
        schema=TRANSCRIPT_SCHEMA, n_buckets=8, max_files_per_trigger=2,
        on_batch=lambda e, s: modes.append(s["dedup_mode"]))
    assert modes and all(m == "locator" for m in modes), modes
    assert_final_state_equal(table.read(), duckdb_final_state(d))
    assert set(table.applied_offsets) == set(range(80))


def test_stream_multi_file_batches_merge_ranges(spark, small_log, tmp_path):
    """A micro-batch spanning several contiguous files merges their per-file
    ranges into one dense span; final state still oracle-exact."""
    modes: list[str] = []
    d, spec, _ = small_log
    tp = str(tmp_path / "t_loc_stream2")
    table = stream_log(
        spark, d, tp, str(tmp_path / "ckpt_loc2"), schema=TRANSCRIPT_SCHEMA,
        n_buckets=8, max_files_per_trigger=2,
        on_batch=lambda e, s: modes.append(s["dedup_mode"]))
    assert modes and all(m == "locator" for m in modes), modes
    assert_final_state_equal(table.read(), duckdb_final_state(d))


def test_stream_without_file_manifest_falls_back_to_agg(spark, small_log,
                                                        tmp_path):
    """A log whose manifest predates (or failed) per-file ranges streams
    through the Observation-bookkeeping + agg path, same final state."""
    import json
    import os
    import shutil

    d, spec, _ = small_log
    d2 = str(tmp_path / "log_nofo")
    shutil.copytree(d, d2)
    mpath = os.path.join(d2, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    for t in manifest["tranches"]:
        t["file_offsets"] = None
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    modes: list[str] = []
    tp = str(tmp_path / "t_agg_stream")
    table = stream_log(
        spark, d2, tp, str(tmp_path / "ckpt_agg"), schema=TRANSCRIPT_SCHEMA,
        n_buckets=8, on_batch=lambda e, s: modes.append(s["dedup_mode"]))
    assert modes and all(m == "agg" for m in modes), modes
    assert_final_state_equal(table.read(), duckdb_final_state(d))


def test_batch_ranges_density_cross_check():
    """_batch_ranges only returns ranges when the batch's files tile a
    gapless per-partition span; gappy unions and unmanifested files fall
    back to None (→ Observation bookkeeping)."""
    from mimic_iv_etl_spark.cdc.stream import _batch_ranges

    fo = {
        "a.parquet": {0: (0, 9), 1: (0, 4)},
        "b.parquet": {0: (10, 19)},
        "c.parquet": {0: (30, 39)},  # gap vs a/b on partition 0
    }
    assert _batch_ranges({"a.parquet", "b.parquet"}, fo) == {
        0: (0, 19), 1: (0, 4)}
    assert _batch_ranges({"a.parquet", "c.parquet"}, fo) is None
    assert _batch_ranges({"zz.parquet"}, fo) is None
    assert _batch_ranges(set(), fo) is None
    assert _batch_ranges(None, fo) is None
    assert _batch_ranges({"a.parquet"}, None) is None


def test_stream_evolved_log_locator_all_the_way(spark, evolved_log, tmp_path):
    """Schema evolution through the STREAMING path: the evolved tranche's
    added columns land exactly at its first micro-batch, every micro-batch
    of both tranches still runs the locator kernel (per-file ranges exist on
    both sides of the evolution point), and the final state is oracle-exact."""
    modes: list[str] = []
    d, spec, _ = evolved_log
    tp = str(tmp_path / "t_ev_stream")
    table = stream_log(
        spark, d, tp, str(tmp_path / "ckpt_ev"), schema=TRANSCRIPT_SCHEMA,
        n_buckets=8, on_batch=lambda e, s: modes.append(s["dedup_mode"]))
    assert [f.name for f in table.schema.fields][-2:] == ["tool_version",
                                                          "latency_ms"]
    assert modes and all(m == "locator" for m in modes), modes
    assert_final_state_equal(table.read(), duckdb_final_state(d))
