"""Round-3 apply-path mechanics: manifest-driven arithmetic offset
bookkeeping, the bucket-fused single-shuffle LWW plan, the literal-predicate
exactly-once filter, manifest backfill, and sidecar auto-flush.

All end-state assertions go through the independent DuckDB oracle
(``cdc/oracle.py``) — the same per-turn text-equality gate as the rest of the
apply E2E suite.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mimic_iv_etl_spark.cdc import apply as apply_mod
from mimic_iv_etl_spark.cdc.apply import apply_batch
from mimic_iv_etl_spark.cdc.changelog import (ChangeLogSpec,
                                              generate_change_log,
                                              upgrade_manifest)
from mimic_iv_etl_spark.cdc.metrics import read_lineage, read_metrics
from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state
from mimic_iv_etl_spark.cdc.replay import replay_log
from mimic_iv_etl_spark.lake.merge import lww_bucket_fused, lww_reduce
from mimic_iv_etl_spark.lake.table import BUCKET_COL, LakeTable
from tests.util import TRANSCRIPT_SCHEMA, assert_final_state_equal


@pytest.mark.parametrize("mode", ["auto", "agg"])
def test_replay_uses_manifest_arithmetic_and_matches_oracle(
        spark, small_log, tmp_path, mode):
    """The generator's manifest carries dense per-partition offset ranges, so
    the whole replay does its exactly-once bookkeeping with no Observation
    and no ranges aggregate — and still lands oracle-equal state with exact
    per-partition lineage. 'auto' resolves to the packed-stamp locator
    kernel, so this run IS the locator correctness gate (ties, late
    arrivals, deletes, hot keys — all through the independent oracle)."""
    d, spec, manifest = small_log
    assert all(t["dense_offsets"] for t in manifest["tranches"])
    tp = str(tmp_path / f"t_manifest_{mode}")
    out = replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA,
                     batch_offsets=700, n_buckets=8, dedup_mode=mode)
    assert out["events_applied"] == spec.n_events
    tbl = LakeTable(spark, tp)
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))

    # lineage: arithmetic ranges must equal the data's actual ranges
    lin = read_lineage(spark, tbl.path).toPandas()
    assert int(lin["events"].sum()) == spec.n_events
    data = spark.read.parquet(*sorted(glob.glob(f"{d}/tranche-*")))
    actual = {int(r["partition"]): int(r["hi"]) for r in
              data.groupBy("partition").agg(F.max("offset").alias("hi")).collect()}
    assert tbl.applied_offsets == actual

    # resume: a second replay is pure metadata — no new snapshot, no scan jobs
    v = tbl.version
    out2 = replay_log(spark, d, tp, batch_offsets=700)
    assert out2["events_applied"] == 0
    assert out2["batches"] == 0
    assert LakeTable(spark, tp).version == v


def test_locator_kernel_is_hash_aggregate_and_matches_agg(spark, small_log):
    """The packed-stamp winner-locator plan must be a HashAggregate (the
    wide max_by struct kernel silently degrades to SortAggregate — the r2
    scaling killer), and its locator set must equal the classic agg plan's
    winners exactly."""
    from mimic_iv_etl_spark.lake.merge import lww_winner_locators

    d, _, _ = small_log
    log = spark.read.parquet(*sorted(glob.glob(f"{d}/tranche-*")))
    cand = log.select(
        "conv_id", "turn_idx", "ts",
        (F.col("op") == "D").alias("_deleted"),
        F.col("offset").cast("long").alias("_lww_offset"),
        F.col("partition").cast("int").alias("_lww_partition"))

    locs = lww_winner_locators(cand, ["conv_id", "turn_idx"])
    plan = locs._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "SortAggregate" not in plan, plan

    got = {(r["p"], r["o"]) for r in locs.collect()}
    agg = lww_reduce(cand, ["conv_id", "turn_idx"], mode="agg")
    want = {(r["_lww_partition"], r["_lww_offset"]) for r in agg.collect()}
    assert got == want


def test_locator_resume_with_different_windows(spark, small_log, tmp_path):
    """Crash/resume where the second replay slices the offset space into
    DIFFERENT micro-batch windows: every window partially overlaps applied
    state, so the locator bitmap must be built from hwm-clipped ranges and
    the hwm row filter must agree with it exactly — any drift double-applies
    or drops rows and the oracle equality below fails."""
    from mimic_iv_etl_spark.cdc.replay import _manifest_tranches

    d, spec, _ = small_log
    tp = str(tmp_path / "t_rewin")
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    t_meta = _manifest_tranches(d)[tranche]
    # first pass: one locator batch covering only offsets [0, 1100) — the
    # table is left mid-window relative to the 700-wide replay below
    window0 = {}
    for p, (lo, hi) in ((int(p), (int(r[0]), int(r[1])))
                        for p, r in t_meta["partition_offsets"].items()):
        if lo < 1100:
            window0[p] = (lo, min(hi, 1099))
    tbl = LakeTable.create(spark, tp, TRANSCRIPT_SCHEMA, n_buckets=4)
    df = spark.read.parquet(tranche).drop("payload")
    stats1 = apply_batch(tbl, df.filter(F.col("offset") < 1100), batch_id=0,
                         dedup_mode="locator", manifest_ranges=window0)
    assert 0 < stats1["events_applied"] < spec.n_events
    # resume with 700-wide windows: window [700, 1400) straddles the
    # committed high-water marks — 700..1099 stale, 1100..1399 fresh
    out2 = replay_log(spark, d, tp, batch_offsets=700)
    assert stats1["events_applied"] + out2["events_applied"] == spec.n_events
    assert_final_state_equal(LakeTable(spark, tp).read(), duckdb_final_state(d))
    # applied exactly once: lineage events sum to the log size
    lin = read_lineage(spark, tp).toPandas()
    assert int(lin["events"].sum()) == spec.n_events


def test_locator_bit_budget_fallback():
    from mimic_iv_etl_spark.cdc.apply import _locator_supported

    ok = [{"partition": 3, "min_offset": 0, "max_offset": 10_000}]
    assert _locator_supported(ok)
    assert not _locator_supported([])
    assert not _locator_supported(
        [{"partition": 70_000, "min_offset": 0, "max_offset": 10}])
    assert not _locator_supported(
        [{"partition": 0, "min_offset": 0, "max_offset": 1 << 37}])


@pytest.mark.parametrize("salt", [1, 4])
def test_bucket_fused_dedup_matches_oracle(spark, small_log, tmp_path, salt):
    """dedup_mode='bucket': one wide shuffle, winners land pre-partitioned;
    final state identical to the classic agg plan and the oracle; file count
    stays bounded by the partition layout."""
    d, spec, _ = small_log
    tp = str(tmp_path / f"t_fused_{salt}")
    out = replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA,
                     batch_offsets=1_000, n_buckets=8,
                     dedup_mode="bucket", write_salt=salt)
    assert out["events_applied"] == spec.n_events
    tbl = LakeTable(spark, tp)
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))
    # every commit stages at most n_buckets × salt files (the pre-partitioned
    # write must not explode into tasks × buckets tiny files)
    history = sorted(tbl.history(), key=lambda s: s["version"])
    for prev, cur in zip(history, history[1:]):
        prev_paths = {e["path"]
                      for e in tbl.at_version(prev["version"]).files}
        added = [e for e in tbl.at_version(cur["version"]).files
                 if e["path"] not in prev_paths]
        assert len(added) <= 8 * salt


def test_bucket_fused_is_single_exchange(spark):
    """The fused plan's physical signature: exactly ONE Exchange between scan
    and winners (vs two in the classic agg + bucket-repartition chain)."""
    df = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 37).cast("string")).alias("conv_id"),
        (F.col("id") % 5).cast("int").alias("turn_idx"),
        F.col("id").cast("timestamp").alias("ts"),
        F.lit(False).alias("_deleted"),
        F.col("id").alias("_lww_offset"),
        F.lit(0).cast("int").alias("_lww_partition"),
    ).withColumn(BUCKET_COL,
                 F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int"))
    fused = lww_bucket_fused(df, ["conv_id", "turn_idx"], BUCKET_COL, 8)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

    classic = lww_reduce(df.drop(BUCKET_COL), ["conv_id", "turn_idx"]) \
        .withColumn(BUCKET_COL, F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int")) \
        .repartition(8, F.col(BUCKET_COL))
    classic_plan = classic._jdf.queryExecution().executedPlan().toString()
    assert classic_plan.count("Exchange") == 2, classic_plan

    # and the two plans agree row-for-row
    a = {tuple(r) for r in fused.drop(BUCKET_COL).collect()}
    b = {tuple(r) for r in classic.drop(BUCKET_COL).collect()}
    assert a == b


def test_hwm_literal_predicate_equals_join_path(spark, small_log, tmp_path,
                                                monkeypatch):
    """Exactly-once row filtering must behave identically through the literal
    codegen predicate (≤cap partitions) and the broadcast-join fallback."""
    d, spec, _ = small_log
    log = spark.read.parquet(*sorted(glob.glob(f"{d}/tranche-*"))).drop("payload")

    results = []
    for cap in (64, 0):  # 0 forces the join path
        monkeypatch.setattr(apply_mod, "_HWM_PREDICATE_CAP", cap)
        tp = str(tmp_path / f"t_hwm_{cap}")
        tbl = LakeTable.create(spark, tp, TRANSCRIPT_SCHEMA, n_buckets=4)
        apply_batch(tbl, log.filter(F.col("offset") < 900), batch_id=0)
        stats = apply_batch(tbl, log.filter(F.col("offset") < 1400), batch_id=1)
        results.append(stats["events_applied"])
        apply_batch(tbl, log, batch_id=2)
        assert_final_state_equal(tbl.read(), duckdb_final_state(d))
    assert results[0] == results[1] > 0


def test_upgrade_manifest_backfills_and_verifies_density(tmp_path):
    d = str(tmp_path / "log_up")
    spec = ChangeLogSpec(n_events=3_000, n_convs=100, n_partitions=3, seed=5)
    original = generate_change_log(d, spec)
    # strip the new fields, as an older generator would have written it
    mpath = os.path.join(d, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    for t in m["tranches"]:
        for k in ("offset_lo", "offset_hi", "partitions", "partition_offsets",
                  "dense_offsets"):
            t.pop(k)
    with open(mpath, "w") as f:
        json.dump(m, f)

    upgraded = upgrade_manifest(d)
    for t_new, t_orig in zip(upgraded["tranches"], original["tranches"]):
        for k in ("offset_lo", "offset_hi", "partitions", "partition_offsets",
                  "dense_offsets"):
            assert t_new[k] == t_orig[k]
    assert all(t["dense_offsets"] for t in upgraded["tranches"])


def test_upgrade_manifest_detects_gappy_offsets(tmp_path):
    """A log whose offsets have gaps must NOT be stamped dense — the
    arithmetic bookkeeping path would otherwise record never-delivered
    offsets as applied."""
    d = str(tmp_path / "log_gap")
    t_dir = os.path.join(d, "tranche-0")
    os.makedirs(t_dir)
    tbl = pa.table({
        "op": ["I", "I", "I"],
        "conv_id": ["c1", "c2", "c3"],
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "text": ["a", "b", "c"],
        "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        "offset": pa.array([0, 1, 5], pa.int64()),  # gap: 2..4 missing
        "partition": pa.array([0, 0, 0], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(t_dir, "part-00000.parquet"))
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump({"tranches": [{"id": 0, "evolved": False, "rows": 3,
                                 "files": []}], "n_events": 3,
                   "n_partitions": 1}, f)
    up = upgrade_manifest(d)
    assert up["tranches"][0]["dense_offsets"] is False
    assert up["tranches"][0]["partition_offsets"]["0"] == [0, 5]


def test_replay_autoflushes_sidecars(spark, small_log, tmp_path):
    d, spec, _ = small_log
    tp = str(tmp_path / "t_flush")
    replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA, batch_offsets=1_000,
               n_buckets=4)
    flushed = glob.glob(os.path.join(tp, "_metrics", "flushed", "*.parquet"))
    assert flushed, "replay_log must leave lineage/metrics cluster-durable"
    met = read_metrics(spark, tp).toPandas()
    assert int(met["events_applied"].sum()) == spec.n_events
    # and the live JSONL tail was folded in (no double counting)
    assert not os.path.exists(os.path.join(tp, "_metrics", "metrics.jsonl"))


def test_scrub_version_guard(spark, small_log, tmp_path, monkeypatch):
    """On a non-pinned Spark version the reflection scrub refuses (one loud
    warning) and apply_batch's bookkeeping degrades to the separate-aggregate
    path instead of poisoning the session via Observation."""
    import pyspark

    from mimic_iv_etl_spark import session as session_mod

    monkeypatch.setattr(pyspark, "__version__", "4.2.0")
    monkeypatch.setattr(session_mod, "_warned_scrub_version", False)
    assert not session_mod.observation_scrub_available()
    with pytest.warns(RuntimeWarning, match="validated against Spark"):
        assert session_mod.scrub_observation_manager(spark) is False

    d, spec, _ = small_log
    log = spark.read.parquet(*sorted(glob.glob(f"{d}/tranche-*"))).drop("payload")
    tbl = LakeTable.create(spark, str(tmp_path / "t_guard"), TRANSCRIPT_SCHEMA,
                           n_buckets=4)
    stats = apply_batch(tbl, log, batch_id=0,
                        source_partitions=list(range(spec.n_partitions)))
    assert stats["events_applied"] == spec.n_events
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_locator_driver_budget_falls_back_to_agg(spark, small_log, tmp_path):
    """VERDICT r03 item 5: a batch whose estimated locator driver transfer
    (winner locators + offset bitmap) exceeds the configured budget must
    degrade to the agg kernel — same oracle-exact final state — instead of
    risking a driver OOM."""
    from mimic_iv_etl_spark.cdc.replay import _manifest_tranches

    d, spec, _ = small_log
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    t_meta = _manifest_tranches(d)[tranche]
    ranges = {int(p): (int(r[0]), int(r[1]))
              for p, r in t_meta["partition_offsets"].items()}
    df = spark.read.parquet(tranche).drop("payload")
    tp = str(tmp_path / "t_budget")
    tbl = LakeTable.create(spark, tp, TRANSCRIPT_SCHEMA, n_buckets=4)
    stats = apply_batch(tbl, df, batch_id=0, dedup_mode="locator",
                        manifest_ranges=ranges, locator_driver_budget=1024)
    assert stats["dedup_mode"] == "agg"
    assert stats["events_applied"] == spec.n_events
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_locator_handles_more_than_64_partitions(spark, tmp_path):
    """VERDICT r04 item 1: a Kafka-style log with hundreds of source
    partitions must STAY on the locator fast path. The bitmap probe indexes
    broadcast (lo, hi, base) lookup arrays (constant-size expression) instead
    of chaining one when() per partition, so the old 64-partition codegen cap
    is gone: with 80 partitions the apply must report dedup_mode='locator',
    the probe plan must be a broadcast with no per-partition CASE chain, and
    the final state must match the independent DuckDB oracle."""
    from mimic_iv_etl_spark.cdc.apply import (_locator_supported,
                                              _locator_winners)
    from mimic_iv_etl_spark.cdc.replay import _manifest_tranches

    many = [{"partition": p, "min_offset": 0, "max_offset": 10}
            for p in range(300)]
    assert _locator_supported(many)

    d = str(tmp_path / "log_manyparts")
    spec = ChangeLogSpec(n_events=8_000, n_convs=250, n_partitions=80, seed=11)
    generate_change_log(d, spec)
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    t_meta = _manifest_tranches(d)[tranche]
    ranges = {int(p): (int(r[0]), int(r[1]))
              for p, r in t_meta["partition_offsets"].items()}
    assert len(ranges) == 80
    df = spark.read.parquet(tranche).drop("payload")
    tp = str(tmp_path / "t_manyparts")
    tbl = LakeTable.create(spark, tp, TRANSCRIPT_SCHEMA, n_buckets=4)
    stats = apply_batch(tbl, df, batch_id=0, dedup_mode="locator",
                        manifest_ranges=ranges)
    assert stats["dedup_mode"] == "locator"
    assert stats["events_applied"] == spec.n_events
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))

    # plan shape: probe is a broadcast join + array-lookup filter whose
    # expression size does not grow with the partition count
    rlist = [{"partition": p, "min_offset": lo, "max_offset": hi}
             for p, (lo, hi) in sorted(ranges.items())]
    cand = df.select(
        "conv_id", "turn_idx", "ts",
        (F.col("op") == "D").alias("_deleted"),
        F.col("offset").cast("long").alias("_lww_offset"),
        F.col("partition").cast("int").alias("_lww_partition"))
    winners, cleanup = _locator_winners(
        cand, ["conv_id", "turn_idx"], rlist, tp)
    try:
        plan = winners._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan, plan
        assert plan.count("CASE WHEN") < 5, "per-partition when() chain is back"
        # exactly one winner per key present in the batch (deletes included)
        assert winners.count() == df.select("conv_id", "turn_idx").distinct().count()
    finally:
        cleanup()


def test_manifest_validation_aborts_on_missing_offsets(spark, small_log,
                                                       tmp_path):
    """ADVICE r03 (medium): manifest_ranges claiming offsets the data does
    not contain (truncated/corrupt file) must abort BEFORE commit — silently
    advancing applied_offsets past never-applied events is undetectable data
    loss. Staged files are discarded; the table stays untouched."""
    from mimic_iv_etl_spark.cdc.replay import _manifest_tranches

    d, spec, _ = small_log
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    t_meta = _manifest_tranches(d)[tranche]
    ranges = {int(p): (int(r[0]), int(r[1]))
              for p, r in t_meta["partition_offsets"].items()}
    p0 = min(ranges)
    ranges[p0] = (ranges[p0][0], ranges[p0][1] + 500)  # 500 phantom offsets
    df = spark.read.parquet(tranche).drop("payload")
    tp = str(tmp_path / "t_val_missing")
    tbl = LakeTable.create(spark, tp, TRANSCRIPT_SCHEMA, n_buckets=4)
    v0 = tbl.version
    with pytest.raises(RuntimeError, match="cross-check"):
        apply_batch(tbl, df, batch_id=0, dedup_mode="locator",
                    manifest_ranges=ranges)
    tbl2 = LakeTable(spark, tp)
    assert tbl2.version == v0
    assert tbl2.applied_offsets == {}
    assert tbl2.read().count() == 0
    # ADVICE r04: the abort path must not leak the locator staging dir, and
    # the Observation scrub must have run (field nulled) — otherwise later
    # jobs capturing the session die with NotSerializableException
    assert not glob.glob(os.path.join(tp, "_staging", "lww-bitmap-*"))
    jss = spark._jsparkSession  # noqa: SLF001
    fld = jss.getClass().getDeclaredField("observationManager")
    fld.setAccessible(True)
    assert fld.get(jss) is None


def test_manifest_validation_range_exact_above_predicate_cap(spark, tmp_path):
    """ADVICE r04: beyond the 64-partition chained-predicate cap the
    manifest validation must stay RANGE-exact (broadcast-joined lookup), not
    degrade to membership-plus-count. Corruption scenario: one in-range row
    missing and one out-of-range row added in the same declared partition —
    n_total matches and partition membership passes, so a membership-only
    check would commit a desynced applied_offsets map. Exercised in agg mode
    (no driver-side winner cross-check to catch it instead)."""
    from mimic_iv_etl_spark.cdc.replay import _manifest_tranches

    d = str(tmp_path / "log_valcap")
    spec = ChangeLogSpec(n_events=8_000, n_convs=250, n_partitions=80, seed=13)
    generate_change_log(d, spec)
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    t_meta = _manifest_tranches(d)[tranche]
    ranges = {int(p): (int(r[0]), int(r[1]))
              for p, r in t_meta["partition_offsets"].items()}
    assert len(ranges) > 64
    p0 = min(ranges)
    lo0, hi0 = ranges[p0]
    df = spark.read.parquet(tranche).drop("payload")
    moved = (df.filter((F.col("partition") == p0) & (F.col("offset") == lo0))
             .withColumn("offset", F.lit(hi0 + 1).cast("long")))
    bad = (df.filter(~((F.col("partition") == p0) & (F.col("offset") == lo0)))
           .unionByName(moved))
    assert bad.count() == df.count()  # counts cancel — the trap
    tp = str(tmp_path / "t_valcap")
    tbl = LakeTable.create(spark, tp, TRANSCRIPT_SCHEMA, n_buckets=4)
    with pytest.raises(RuntimeError, match="cross-check"):
        apply_batch(tbl, bad, batch_id=0, dedup_mode="agg",
                    manifest_ranges=ranges)
    tbl2 = LakeTable(spark, tp)
    assert tbl2.applied_offsets == {}
    assert tbl2.read().count() == 0


def test_manifest_validation_aborts_on_undeclared_partition(spark, small_log,
                                                            tmp_path):
    """Rows from a partition absent from manifest_ranges must abort, not be
    silently dropped (locator) or applied-but-unrecorded (agg)."""
    from mimic_iv_etl_spark.cdc.replay import _manifest_tranches

    d, spec, _ = small_log
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    t_meta = _manifest_tranches(d)[tranche]
    ranges = {int(p): (int(r[0]), int(r[1]))
              for p, r in t_meta["partition_offsets"].items()}
    del ranges[max(ranges)]  # data still holds this partition's rows
    df = spark.read.parquet(tranche).drop("payload")
    for mode in ("locator", "agg"):
        tp = str(tmp_path / f"t_val_undecl_{mode}")
        tbl = LakeTable.create(spark, tp, TRANSCRIPT_SCHEMA, n_buckets=4)
        with pytest.raises(RuntimeError, match="cross-check"):
            apply_batch(tbl, df, batch_id=0, dedup_mode=mode,
                        manifest_ranges=ranges)
        tbl2 = LakeTable(spark, tp)
        assert tbl2.applied_offsets == {}
        assert tbl2.read().count() == 0


def test_upgrade_manifest_backfills_file_offsets(spark, tmp_path):
    """upgrade_manifest must (idempotently) backfill per-file dense ranges on
    logs written before the field existed, verifying density per file."""
    d = str(tmp_path / "log_up")
    generate_change_log(d, ChangeLogSpec(n_events=2_000, n_convs=100,
                                         n_partitions=3, seed=5))
    mpath = os.path.join(d, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    for t in manifest["tranches"]:
        written = t.pop("file_offsets")
        t.pop("partition_offsets")
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    up = upgrade_manifest(d)
    t0 = up["tranches"][0]
    assert t0["dense_offsets"] and t0["file_offsets"] == written
    # idempotent: second run rewrites nothing
    mtime = os.path.getmtime(mpath)
    upgrade_manifest(d)
    assert os.path.getmtime(mpath) == mtime


def test_lag_metric_drains_to_zero(spark, small_log, tmp_path):
    """The per-batch metrics row carries lag_events = Σ max(0, log tail −
    applied hwm): strictly decreasing across a replay and exactly 0 after
    the final commit (north star: throughput/lag metrics)."""
    d, spec, _ = small_log
    tp = str(tmp_path / "t_lag")
    replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA, batch_offsets=700,
               n_buckets=4)
    rows = (read_metrics(spark, tp)
            .orderBy("batch_id").select("lag_events").collect())
    lags = [r["lag_events"] for r in rows]
    assert all(v is not None for v in lags)
    assert lags == sorted(lags, reverse=True)
    assert lags[0] > 0 and lags[-1] == 0
    # each batch's lag drop equals exactly the events it applied
    applied = [r["events_applied"] for r in
               read_metrics(spark, tp).orderBy("batch_id")
               .select("events_applied").collect()]
    assert lags[0] == spec.n_events - applied[0]
    for prev, cur, n in zip(lags, lags[1:], applied[1:]):
        assert prev - cur == n
