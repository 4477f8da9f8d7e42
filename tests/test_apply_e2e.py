"""End-to-end: change-log replay through apply_batch == independent oracle.

This is the north-rule correctness gate: per-turn text equality under stable
(conv_id, turn_idx) ordering after full-log replay, including LWW ties,
late arrivals, deletes, hot-key skew, and (separately) schema evolution.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_etl_spark.cdc.apply import apply_batch
from mimic_iv_etl_spark.cdc.metrics import read_lineage, read_metrics
from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state
from mimic_iv_etl_spark.lake.table import LakeTable
from tests.util import TRANSCRIPT_SCHEMA, assert_final_state_equal


def _load_log(spark, log_dir):
    import glob

    dirs = sorted(glob.glob(f"{log_dir}/tranche-*"))
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def _batches(df, n_batches, n_partitions, total):
    """Deterministic micro-batches: contiguous per-partition offset windows."""
    max_off = df.agg(F.max("offset")).collect()[0][0]
    per = -(-(max_off + 1) // n_batches)
    return [
        df.filter((F.col("offset") >= i * per) & (F.col("offset") < (i + 1) * per))
        for i in range(n_batches)
    ]


@pytest.mark.parametrize("mode", ["agg", "salted_window"])
def test_single_batch_replay_matches_oracle(spark, small_log, tmp_path, mode):
    d, spec, _ = small_log
    tbl = LakeTable.create(spark, str(tmp_path / f"t_{mode}"), TRANSCRIPT_SCHEMA, n_buckets=8)
    stats = apply_batch(tbl, _load_log(spark, d).drop("payload"), batch_id=0, dedup_mode=mode)
    assert stats["events_applied"] == spec.n_events
    assert stats["winners"] > 0
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_multi_batch_replay_matches_oracle(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tbl = LakeTable.create(spark, str(tmp_path / "t_multi"), TRANSCRIPT_SCHEMA, n_buckets=8)
    log = _load_log(spark, d).drop("payload")
    applied = 0
    for i, b in enumerate(_batches(log, 5, spec.n_partitions, spec.n_events)):
        applied += apply_batch(tbl, b, batch_id=i)["events_applied"]
    assert applied == spec.n_events
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))

    # compaction must not change visible state
    tbl.compact()
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))

    # lineage covers every (batch, partition) range; metrics one row per batch
    lin = read_lineage(spark, tbl.path).toPandas()
    assert lin["events"].sum() == spec.n_events
    assert set(lin["partition"]) == set(range(spec.n_partitions))
    met = read_metrics(spark, tbl.path).toPandas()
    assert len(met) == 5 and (met["events_per_sec"] > 0).all()

    # flushing sidecars to parquet segments (cluster-durable table sink) must
    # not change what reads return, and the JSONL tail restarts fresh
    from mimic_iv_etl_spark.cdc.metrics import append_metrics, flush_sidecars

    flush_sidecars(spark, tbl.path)
    assert read_lineage(spark, tbl.path).count() == len(lin)
    assert read_metrics(spark, tbl.path).count() == len(met)
    append_metrics(tbl.path, {"batch_id": 99, "events_in": 0, "events_applied": 0,
                              "winners": 0, "seconds": 0.1, "events_per_sec": 0.0,
                              "touched_buckets": 0, "skipped": True})
    assert read_metrics(spark, tbl.path).count() == len(met) + 1  # union of both
    flush_sidecars(spark, tbl.path)
    assert read_metrics(spark, tbl.path).count() == len(met) + 1


def test_reapply_is_idempotent_noop(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tbl = LakeTable.create(spark, str(tmp_path / "t_idem"), TRANSCRIPT_SCHEMA, n_buckets=8)
    log = _load_log(spark, d).drop("payload")
    batches = _batches(log, 3, spec.n_partitions, spec.n_events)
    for i, b in enumerate(batches):
        apply_batch(tbl, b, batch_id=i)
    v = tbl.version
    files_before = [e["path"] for e in tbl.files]

    # replay batch 1 (duplicate delivery / foreachBatch retry) → no-op
    stats = apply_batch(tbl, batches[1], batch_id=99)
    assert stats["skipped"] and stats["events_applied"] == 0
    assert tbl.version == v  # table untouched
    assert [e["path"] for e in tbl.files] == files_before

    # with commit_noop=True the epoch is recorded as a metadata-only commit
    stats = apply_batch(tbl, batches[1], batch_id=100, commit_noop=True)
    assert stats["skipped"] and tbl.version == v + 1
    assert [e["path"] for e in tbl.files] == files_before
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_partial_overlap_applies_only_new_offsets(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tbl = LakeTable.create(spark, str(tmp_path / "t_overlap"), TRANSCRIPT_SCHEMA, n_buckets=8)
    log = _load_log(spark, d).drop("payload")
    half = log.filter(F.col("offset") < 1000)
    apply_batch(tbl, half, batch_id=0)
    # overlapping redelivery: offsets 0..1500 — only 1000..1500 are new
    stats = apply_batch(tbl, log.filter(F.col("offset") < 1500), batch_id=1)
    assert stats["events_applied"] == log.filter(
        (F.col("offset") >= 1000) & (F.col("offset") < 1500)
    ).count()
    apply_batch(tbl, log, batch_id=2)
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_schema_evolution_mid_log(spark, evolved_log, tmp_path):
    d, spec, _ = evolved_log
    tbl = LakeTable.create(spark, str(tmp_path / "t_evo"), TRANSCRIPT_SCHEMA, n_buckets=8)
    # tranche-0: base schema; tranche-1: + tool_version, + latency_ms
    t0 = spark.read.parquet(f"{d}/tranche-0").drop("payload")
    t1 = spark.read.parquet(f"{d}/tranche-1").drop("payload")
    apply_batch(tbl, t0, batch_id=0)
    assert [f.name for f in tbl.schema.fields] == [f.name for f in TRANSCRIPT_SCHEMA.fields]
    apply_batch(tbl, t1, batch_id=1)
    names = [f.name for f in tbl.schema.fields]
    assert names[-2:] == ["tool_version", "latency_ms"]
    assert tbl.schema["latency_ms"].dataType.simpleString() == "bigint"
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_observed_ranges_mode_matches_oracle_and_guards_universe(
        spark, small_log, tmp_path):
    """source_partitions mode: offset bookkeeping observed during the write
    job. Wrong universe → abort before commit with staged files discarded;
    right universe → oracle-equal state; stale redelivery → skipped no-op."""
    import pytest

    d, spec, _ = small_log
    tbl = LakeTable.create(spark, str(tmp_path / "t_obs"), TRANSCRIPT_SCHEMA,
                           n_buckets=8)
    log = _load_log(spark, d).drop("payload")

    with pytest.raises(RuntimeError, match="outside source_partitions"):
        apply_batch(tbl, log, batch_id=0, source_partitions=[0, 1])
    assert tbl.refresh().version == 0, "aborted batch must not commit"
    assert tbl.vacuum(grace_seconds=0.0)["data_files"] == 0, \
        "aborted batch must discard its staged files"

    universe = list(range(spec.n_partitions))
    stats = apply_batch(tbl, log, batch_id=1, source_partitions=universe)
    assert stats["events_applied"] == spec.n_events
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))

    v = tbl.version
    stats2 = apply_batch(tbl, log, batch_id=2, source_partitions=universe)
    assert stats2["skipped"] and stats2["events_applied"] == 0
    assert tbl.refresh().version == v, "stale redelivery must not commit"
    assert tbl.vacuum(grace_seconds=0.0)["data_files"] == 0

    # Spark 4.1.x: Observation use poisons the session — every later job
    # whose task closure captures the SparkSession (all pyspark.ml model
    # transforms) dies with NotSerializableException: ObservationManager.
    # apply_batch must scrub that state (session.scrub_observation_manager),
    # or the engine silently breaks unrelated ML workloads session-wide.
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    df = spark.range(200).select(
        (F.col("id") % 2 * 1.0).alias("x1"),
        (F.col("id") % 2).cast("int").alias("label"))
    feats = VectorAssembler(inputCols=["x1"], outputCol="features").transform(df)
    model = LogisticRegression(labelCol="label", maxIter=5).fit(feats)
    assert model.transform(feats).groupBy("prediction").count().count() == 2


def test_flush_sidecars_leaves_live_claims_alone(spark, tmp_path):
    """ADVICE r05: the crash-leftover sweep must not steal a LIVE concurrent
    flusher's claim (a young .flushing-* file) — only claims older than the
    grace window are reclaimed."""
    import json
    import os
    import time

    from mimic_iv_etl_spark.cdc.metrics import (append_metrics, flush_sidecars,
                                                read_metrics)

    tdir = str(tmp_path / "t_flush")
    row = {"batch_id": 1, "events_in": 1, "events_applied": 1, "winners": 1,
           "seconds": 0.1, "events_per_sec": 10.0, "touched_buckets": 1,
           "skipped": False}
    append_metrics(tdir, row)
    jsonl = os.path.join(tdir, "_metrics", "metrics.jsonl")
    # simulate a concurrent flusher mid-flush: a freshly-claimed tail
    live_claim = jsonl + ".flushing-livelive"
    os.replace(jsonl, live_claim)
    flush_sidecars(spark, tdir)
    assert os.path.exists(live_claim), "live claim must not be stolen"
    # age it past the grace window → a later sweep reclaims it
    old = time.time() - 120
    os.utime(live_claim, (old, old))
    flush_sidecars(spark, tdir)
    assert not os.path.exists(live_claim)
    got = read_metrics(spark, tdir).toPandas()
    assert len(got) == 1 and int(got["batch_id"][0]) == 1
