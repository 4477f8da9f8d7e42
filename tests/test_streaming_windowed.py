"""Streaming windowed ops: batch-plan correctness + live streaming smoke."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from mimic_iv_etl_spark.functions import decode_payload_json
from mimic_iv_etl_spark.streaming import sessionize, windowed_activity_counts


def test_windowed_counts_batch_semantics(spark):
    rows = [("u", "2026-01-01 00:00:30"), ("u", "2026-01-01 00:04:00"),
            ("u", "2026-01-01 00:06:00"), ("a", "2026-01-01 00:01:00")]
    df = spark.createDataFrame(rows, "role string, t string").select(
        "role", F.col("t").cast("timestamp_ntz").alias("ts"))
    out = windowed_activity_counts(df, window="5 minutes")
    got = {(str(r["window_start"]), r["role"]): r["events"] for r in out.collect()}
    assert got == {("2026-01-01 00:00:00", "u"): 2, ("2026-01-01 00:00:00", "a"): 1,
                   ("2026-01-01 00:05:00", "u"): 1}


def test_sessionize_gap(spark):
    rows = [("c1", "2026-01-01 00:00:00"), ("c1", "2026-01-01 00:10:00"),
            ("c1", "2026-01-01 01:10:00"), ("c2", "2026-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "conv_id string, t string").select(
        "conv_id", F.col("t").cast("timestamp_ntz").alias("ts"))
    out = sessionize(df, gap="30 minutes")
    per_key = {(r["conv_id"], str(r["session_start"])): r["events"] for r in out.collect()}
    # c1 splits into two sessions (70-minute silence), c2 has one
    assert per_key == {("c1", "2026-01-01 00:00:00"): 2,
                       ("c1", "2026-01-01 01:10:00"): 1,
                       ("c2", "2026-01-01 00:00:00"): 1}


def test_windowed_counts_on_live_stream(spark, small_log, tmp_path):
    d, _, _ = small_log
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    schema = spark.read.parquet(tranche).schema
    src = spark.readStream.schema(schema).parquet(tranche)
    agg = windowed_activity_counts(src, window="1 hour", watermark="2 hours")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("wincounts").start())
    try:
        q.processAllAvailable()
        live = {(str(r["window_start"]), r["role"]): r["events"]
                for r in spark.sql("SELECT * FROM wincounts").collect()}
    finally:
        q.stop()
    batch = {(str(r["window_start"]), r["role"]): r["events"]
             for r in windowed_activity_counts(
                 spark.read.parquet(tranche), window="1 hour").collect()}
    assert live == batch and len(live) > 0


def test_payload_decode_feeds_apply(spark, small_log, tmp_path):
    """The vectorized decode path: drop raw columns, reconstruct them from the
    JSON payload via from_json, replay — final state unchanged."""
    from mimic_iv_etl_spark.cdc.apply import apply_batch
    from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state
    from mimic_iv_etl_spark.lake.table import LakeTable
    from tests.util import TRANSCRIPT_SCHEMA, assert_final_state_equal

    d, _, _ = small_log
    raw = spark.read.parquet(f"{d}/tranche-0")
    reconstructed = (
        decode_payload_json(raw.drop("role", "text", "tool"))
        .withColumnRenamed("role_decoded", "role")
        .withColumnRenamed("text_decoded", "text")
        .withColumnRenamed("tool_decoded", "tool")
        .drop("payload")
    )
    tbl = LakeTable.create(spark, str(tmp_path / "t_dec"), TRANSCRIPT_SCHEMA, n_buckets=8)
    apply_batch(tbl, reconstructed, batch_id=0)
    assert_final_state_equal(tbl.read(), duckdb_final_state(d))
