"""Incremental changelog reads (CDC out) and snapshot-expiry / orphan vacuum.

``changes(from, to]`` must read only the delta files those commits added and
net-collapse multi-update keys under the table's LWW order; vacuum must
reclaim crash-stranded staging/data files without touching anything a
retained snapshot references.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mimic_iv_etl_spark.cdc.apply import apply_batch
from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state
from mimic_iv_etl_spark.lake.table import LakeTable
from tests.util import TRANSCRIPT_SCHEMA, assert_final_state_equal


def _load_log(spark, log_dir):
    dirs = sorted(glob.glob(f"{log_dir}/tranche-*"))
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def _batches(df, n_batches):
    max_off = df.agg(F.max("offset")).collect()[0][0]
    per = -(-(max_off + 1) // n_batches)
    return [
        df.filter((F.col("offset") >= i * per) & (F.col("offset") < (i + 1) * per))
        for i in range(n_batches)
    ]


@pytest.fixture(scope="module")
def replayed(spark, small_log, tmp_path_factory):
    """Table with 4 delta commits + the version after each batch."""
    d, spec, _ = small_log
    tbl = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("chg") / "t"), TRANSCRIPT_SCHEMA,
        n_buckets=8)
    versions = [tbl.version]
    for i, b in enumerate(_batches(_load_log(spark, d).drop("payload"), 4)):
        apply_batch(tbl, b, batch_id=i)
        versions.append(tbl.version)
    return tbl, d, versions


def test_changes_full_range_equals_lww_of_whole_log(replayed):
    """changes(0 → head) = global LWW winner per key, deletes typed."""
    tbl, d, versions = replayed
    full = tbl.changes(0)
    # upserts must equal the visible final state
    ups = full.filter(F.col("_change_type") == "upsert").drop("_change_type")
    assert_final_state_equal(ups, duckdb_final_state(d))
    got = full.toPandas()
    # every key appears exactly once (net collapse)
    assert not got.duplicated(subset=["conv_id", "turn_idx"]).any()
    # deletes are present as typed rows, not silently dropped
    assert (got["_change_type"] == "delete").sum() > 0


def test_changes_single_commit_reads_only_that_delta(replayed):
    """A one-commit range returns exactly that batch's winners — and the plan
    scans only the files that commit added."""
    tbl, _, versions = replayed
    v_from, v_to = versions[1], versions[2]
    out = tbl.changes(v_from, v_to)
    batch2 = tbl.at_version(v_to).files
    batch1 = {e["path"] for e in tbl.at_version(v_from).files}
    added_rows = sum(e["rows"] for e in batch2 if e["path"] not in batch1)
    assert out.count() <= added_rows  # net collapse can only shrink
    assert out.count() > 0
    # physical check: only the added files appear in the scan plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    for e in tbl.at_version(v_from).files:
        assert os.path.basename(e["path"]) not in plan


def test_changes_empty_range_and_validation(replayed):
    tbl, _, versions = replayed
    assert tbl.changes(tbl.version).count() == 0
    with pytest.raises(ValueError):
        tbl.changes(2, 1)
    with pytest.raises(ValueError):
        tbl.changes(0, tbl.version + 5)


def test_compaction_contributes_no_changes(replayed):
    tbl, d, versions = replayed
    v_before = tbl.version
    tbl.compact()
    assert tbl.version > v_before, "compaction should have committed"
    assert tbl.changes(v_before).count() == 0
    # and state is unchanged
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_changes_net_collapse_is_lww(spark, tmp_path):
    """A key updated in two commits shows once, with the later value."""
    import datetime as dt

    tbl = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                           n_buckets=4)
    ts = dt.datetime(2026, 1, 1)

    def ev(text, secs, off, op="U"):
        return ("c1", 0, "user", text, None, ts + dt.timedelta(seconds=secs),
                op, off, 0)

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp_ntz, op string, offset long, "
              "partition int")
    apply_batch(tbl, spark.createDataFrame([ev("v1", 0, 0)], schema), batch_id=0)
    apply_batch(tbl, spark.createDataFrame([ev("v2", 5, 1)], schema), batch_id=1)
    got = tbl.changes(0).collect()
    assert len(got) == 1
    assert got[0]["text"] == "v2" and got[0]["_change_type"] == "upsert"
    # delete in a third commit → single 'delete' row over the whole range
    apply_batch(tbl, spark.createDataFrame([ev(None, 9, 2, "D")], schema),
                batch_id=2)
    got = {r["_change_type"] for r in tbl.changes(0).collect()}
    assert got == {"delete"}
    # ingest continues across a partition evolution: the next batch routes by
    # the new bucket function and the delete stays deleted (tombstone kept)
    tbl = tbl.rebucket(8)
    v = tbl.version
    apply_batch(tbl, spark.createDataFrame(
        [("c2", 0, "user", "post-rebucket", None, ts, "I", 3, 0)], schema),
        batch_id=3)
    assert tbl.n_buckets == 8
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in tbl.read().collect()}
    assert rows == {("c2", 0): "post-rebucket"}
    assert {e["kind"] for e in tbl.files
            if e["path"] not in {x["path"] for x in tbl.at_version(v).files}} == {"delta"}


def test_rebucket_preserves_state_and_routing(replayed):
    """Partition evolution: same logical state, new bucket space, no
    changelog noise, and pruning agrees with the new routing function."""
    tbl, d, _ = replayed
    v_before = tbl.version
    old_files = {e["path"] for e in tbl.files}
    tbl = tbl.rebucket(16)
    assert tbl.n_buckets == 16
    assert {e["bucket"] for e in tbl.files} - set(range(8)), \
        "new bucket space unused — rebucket routed with the old count"
    assert not old_files & {e["path"] for e in tbl.files}
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))
    # a physical rewrite is not a logical change
    assert tbl.changes(v_before).count() == 0
    # bucket pruning under the new function still finds a key
    row = tbl.read().limit(1).collect()[0]
    b = tbl.read().limit(0).sparkSession.createDataFrame(
        [(row["conv_id"],)], "conv_id string").select(
        tbl.bucket_expr("conv_id").alias("b")).collect()[0]["b"]
    pruned = tbl.read(buckets={b}).filter(F.col("conv_id") == row["conv_id"])
    assert pruned.count() > 0


def test_vacuum_reclaims_orphans_and_keeps_referenced(replayed):
    tbl, d, _ = replayed
    # crash-simulated strays: a staging dir and an unreferenced data file
    stray_stage = os.path.join(tbl.path, "_staging", "deadbeef")
    os.makedirs(stray_stage, exist_ok=True)
    with open(os.path.join(stray_stage, "part-x.parquet"), "wb") as f:
        f.write(b"junk")
    stray_data = os.path.join(tbl.path, "data", "bucket=0",
                              "part-orphan.parquet")
    with open(stray_data, "wb") as f:
        f.write(b"junk")

    removed = tbl.vacuum(grace_seconds=0.0)
    assert removed["staging_dirs"] >= 1
    assert removed["data_files"] >= 1
    assert not os.path.exists(stray_stage)
    assert not os.path.exists(stray_data)
    # every referenced file survives; reads still match the oracle
    for e in tbl.files:
        assert os.path.exists(os.path.join(tbl.path, e["path"]))
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_vacuum_grace_protects_fresh_files(replayed):
    tbl, _, _ = replayed
    fresh = os.path.join(tbl.path, "_staging", "inflight")
    os.makedirs(fresh, exist_ok=True)
    removed = tbl.vacuum(grace_seconds=3600.0)
    assert os.path.exists(fresh), "fresh staging dir must survive the grace"
    os.rmdir(fresh)


def test_expire_snapshots_then_vacuum_reclaims_compacted_files(replayed):
    tbl, d, versions = replayed
    tbl.refresh()
    # after compaction (earlier test) old delta files are only referenced by
    # old snapshots; expiring those makes them vacuumable
    expired = tbl.expire_snapshots(keep_last=1)
    assert expired and max(expired) < tbl.version
    removed = tbl.vacuum(grace_seconds=0.0)
    assert removed["data_files"] > 0
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))
    # changes below the retained horizon now fails loudly
    with pytest.raises(ValueError):
        tbl.changes(0)
    # history stops gracefully at the expired horizon
    assert tbl.history()[-1]["version"] >= tbl.version - 1
