"""Physical-plan regression tests: the optimizations the engine is designed
around must be visible in the plans (pyspark_guide: check pushdown/broadcast/
partial agg in .explain), so a refactor can't silently regress them."""

from __future__ import annotations

from pyspark.sql import functions as F

from mimic_iv_etl_spark import registry
from mimic_iv_etl_spark.lake.merge import lww_reduce

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_tpch_q1_pushes_filter_and_prunes_columns(spark):
    df = registry.REGISTRY["tpch_q1"].fn(spark, SF)
    plan = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: props/tax/returnflag columns not needed are absent
    assert "l_comment" not in plan
    assert "partial_sum" in _plan(df).lower() or "HashAggregate" in _plan(df)


def test_order_revenue_broadcasts_customer(spark):
    df = registry.REGISTRY["order_revenue"].fn(spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_lww_agg_uses_partial_aggregation(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = lww_reduce(ev, ["user_id"], stamp_cols=("ts", "event_id"))
    plan = _plan(out)
    assert "partial_max_by" in plan  # map-side combine = skew-proof dedup


def test_semi_join_stays_semi(spark):
    df = registry.REGISTRY["semi_join"].fn(spark, SF)
    assert "LeftSemi" in _optimized(df)


def test_lake_read_prunes_to_selected_buckets(spark, small_log, tmp_path):
    from mimic_iv_etl_spark.cdc.apply import apply_batch
    from mimic_iv_etl_spark.lake.table import LakeTable
    from tests.util import TRANSCRIPT_SCHEMA

    d, _, _ = small_log
    tbl = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=8)
    apply_batch(tbl, spark.read.parquet(f"{d}/tranche-0").drop("payload"), batch_id=0)
    all_files = [e for e in tbl.files]
    one_bucket = {all_files[0]["bucket"]}
    scanned = {f.split("/")[-1] for f in tbl.read(buckets=one_bucket).inputFiles()}
    kept = {e["path"].split("/")[-1] for e in all_files if e["bucket"] in one_bucket}
    dropped = {e["path"].split("/")[-1] for e in all_files if e["bucket"] not in one_bucket}
    assert scanned == kept
    assert not (scanned & dropped)
