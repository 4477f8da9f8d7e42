"""Per-file column stats, clustered compaction, and read_range file skipping.

The 100 TB analytics read path: clustered compaction lays each bucket out as
``split`` files with tight per-file min/max recorded in the manifest;
``read_range`` prunes files against snapshot metadata alone (no footer
reads), with the residual predicate pushed to the scan for row-group
skipping. Reference parity note: the reference engine delegates all data
skipping to BigQuery's storage layer (clustered tables); here it is
engine-owned, Iceberg-style.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state
from mimic_iv_etl_spark.cdc.replay import replay_log
from mimic_iv_etl_spark.lake.table import LakeTable
from tests.util import TRANSCRIPT_SCHEMA, assert_final_state_equal


def _replayed(spark, small_log, tmp_path, name):
    d, spec, _ = small_log
    tp = str(tmp_path / name)
    replay_log(spark, d, tp, schema=TRANSCRIPT_SCHEMA, batch_offsets=4_000,
               n_buckets=8)
    return LakeTable(spark, tp), d


def test_entry_stats_recorded(spark, small_log, tmp_path):
    tbl, _ = _replayed(spark, small_log, tmp_path, "t_stats")
    for e in tbl.files:
        st = e["stats"]
        assert "ts" in st and "conv_id" in st and "turn_idx" in st
        assert st["ts"][0] <= st["ts"][1]
        # internal stamp columns never carry stats (never a user predicate)
        assert not any(k.startswith("_") for k in st)


def test_clustered_compaction_skips_files(spark, small_log, tmp_path):
    tbl, d = _replayed(spark, small_log, tmp_path, "t_clust")
    tbl.compact(cluster_by=["ts"], split=4)
    assert all(e.get("kind") == "base" for e in tbl.files)
    per_bucket: dict[int, int] = {}
    for e in tbl.files:
        per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
    assert max(per_bucket.values()) >= 3, "split did not fan out files"

    # narrow range at the low end of ts: metadata pruning must drop most
    # files (≈ one ts-slice per bucket survives)
    all_ts = sorted(r["ts"] for r in tbl.read().select("ts").collect())
    lo, hi = all_ts[0], all_ts[len(all_ts) // 10]
    kept = LakeTable._prune_by_stats(tbl.files, "ts", lo, hi)
    assert len(kept) <= len(tbl.files) // 2, (len(kept), len(tbl.files))

    # skipping is an optimization, never a semantics change
    got = {(r["conv_id"], r["turn_idx"]) for r in
           tbl.read_range("ts", lo, hi).collect()}
    want = {(r["conv_id"], r["turn_idx"]) for r in
            tbl.read().filter(F.col("ts").between(lo, hi)).collect()}
    assert got == want and got
    # whole-table correctness unchanged by the clustered rewrite
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))


def test_read_range_mor_fallback_is_exact(spark, small_log, tmp_path):
    """While delta files exist, read_range must degrade to LWW-then-filter:
    a winner whose newest version moved OUT of the range must not resurrect
    via file skipping."""
    tbl, _ = _replayed(spark, small_log, tmp_path, "t_fall")
    tbl.compact(cluster_by=["ts"], split=4)
    row = tbl.read().orderBy("ts").limit(1).collect()[0]
    old_ts = row["ts"]
    new_ts = dt.datetime(2030, 1, 1)
    upd = spark.createDataFrame(
        [(row["conv_id"], row["turn_idx"], row["role"], "moved", row["tool"],
          new_ts, False, 10**9, 0)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, _deleted boolean, _lww_offset long, _lww_partition int")
    tbl.append_delta(upd.withColumn("_bucket", tbl.bucket_expr()))

    hit = tbl.read_range("ts", old_ts, old_ts).filter(
        (F.col("conv_id") == row["conv_id"]) &
        (F.col("turn_idx") == row["turn_idx"])).collect()
    assert hit == [], "overwritten version resurrected by range read"
    hit2 = tbl.read_range("ts", new_ts, new_ts).collect()
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in hit2] == [
        (row["conv_id"], row["turn_idx"], "moved")]
    # after compacting the delta away, the skipping path gives the same answer
    tbl.compact(cluster_by=["ts"], split=4)
    assert [(r["conv_id"], r["turn_idx"], r["text"])
            for r in tbl.read_range("ts", new_ts, new_ts).collect()] == [
        (row["conv_id"], row["turn_idx"], "moved")]


def test_persistent_clustering_spec(spark, small_log, tmp_path):
    """set_clustering declares a table-level sort/split spec that EVERY later
    compaction honors (Iceberg sort-order analogue): the table keeps its
    skipping layout as it churns, without anyone passing cluster_by again.
    Spec-driven compaction stays O(churned buckets): only delta-bearing
    buckets rewrite, but in the clustered layout."""
    import datetime as dt

    tbl, d = _replayed(spark, small_log, tmp_path, "t_spec")
    assert tbl.clustering is None
    with pytest.raises(ValueError, match="not in schema"):
        tbl.set_clustering(["no_such_col"])

    tbl.set_clustering(["ts"], split=4)
    assert tbl.clustering == (["ts"], 4)
    v = tbl.version
    tbl.compact()  # no explicit cluster_by — spec shapes the rewrite
    assert tbl.version == v + 1
    per_bucket: dict[int, int] = {}
    for e in tbl.files:
        per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
    assert max(per_bucket.values()) >= 3, "spec-driven compaction not split"

    # the spec rides data commits: append a delta, auto-compact, still there
    upd = spark.createDataFrame(
        [("specconv", 0, "user", "x", None, dt.datetime(2029, 1, 1),
          False, 10**8, 0)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, _deleted boolean, _lww_offset long, _lww_partition int")
    tbl.append_delta(upd.withColumn("_bucket", tbl.bucket_expr()))
    assert tbl.clustering == (["ts"], 4)
    tbl.maybe_compact(max_deltas_per_bucket=0)
    assert all(e.get("kind") == "base" for e in tbl.files)
    # skipping works against the spec-maintained layout
    all_ts = sorted(r["ts"] for r in tbl.read().select("ts").collect())
    lo, hi = all_ts[0], all_ts[len(all_ts) // 10]
    kept = LakeTable._prune_by_stats(tbl.files, "ts", lo, hi)
    assert len(kept) < len(tbl.files)
    got = {(r["conv_id"], r["turn_idx"]) for r in
           tbl.read_range("ts", lo, hi).collect()}
    want = {(r["conv_id"], r["turn_idx"]) for r in
            tbl.read().filter(F.col("ts").between(lo, hi)).collect()}
    assert got == want

    tbl.set_clustering(None)
    assert tbl.clustering is None


def test_prune_by_stats_conservative_rules():
    files = [
        {"path": "a", "stats": {"ts": ["2026-01-01T00:00:00", "2026-01-02T00:00:00"]}},
        {"path": "b", "stats": {"ts": ["2026-03-01T00:00:00", "2026-03-02T00:00:00"]}},
        {"path": "c", "stats": {}},                       # no stats → keep
        {"path": "d"},                                    # legacy entry → keep
        {"path": "e", "stats": {"ts": [5, 9]}},           # wrong type → keep
    ]
    lo, hi = dt.datetime(2026, 1, 1, 12), dt.datetime(2026, 1, 3)
    kept = {e["path"] for e in LakeTable._prune_by_stats(files, "ts", lo, hi)}
    assert kept == {"a", "c", "d", "e"}


def test_prune_by_stats_tz_aware_bound_matches_naive():
    """ADVICE r05: a tz-aware bound used to isoformat with a '+00:00' suffix
    and order wrong against the naive-UTC stat strings when prefixes tie —
    skipping a file that contains boundary-matching rows. Aware bounds must
    prune exactly like their naive-UTC equivalents."""
    files = [
        {"path": "a",
         "stats": {"ts": ["2026-01-01T00:00:00", "2026-01-02T00:00:00"]}},
        {"path": "b",
         "stats": {"ts": ["2026-03-01T00:00:00", "2026-03-02T00:00:00"]}},
    ]
    # aware bound equal to file a's max: naive comparison keeps a; the aware
    # isoformat '2026-01-02T00:00:00+00:00' > '2026-01-02T00:00:00' used to
    # as well, but an aware LO at file max ('qlo > s[1]' with suffix) skipped
    lo_aware = dt.datetime(2026, 1, 2, tzinfo=dt.timezone.utc)
    hi_aware = dt.datetime(2026, 1, 3, tzinfo=dt.timezone.utc)
    kept_aware = {e["path"] for e in
                  LakeTable._prune_by_stats(files, "ts", lo_aware, hi_aware)}
    kept_naive = {e["path"] for e in LakeTable._prune_by_stats(
        files, "ts", dt.datetime(2026, 1, 2), dt.datetime(2026, 1, 3))}
    assert kept_aware == kept_naive == {"a"}
    # and a non-UTC zone converts correctly: 01:00+01:00 == 00:00 UTC
    lo_cet = dt.datetime(2026, 1, 2, 1,
                         tzinfo=dt.timezone(dt.timedelta(hours=1)))
    kept_cet = {e["path"] for e in
                LakeTable._prune_by_stats(files, "ts", lo_cet, hi_aware)}
    assert kept_cet == {"a"}
