"""Custom stateful operator: streaming per-conversation state equals the
batch groupBy ground truth after the stream drains."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from mimic_iv_etl_spark.streaming.stateful import conversation_state


def test_conversation_state_matches_batch(spark, small_log):
    d, _, _ = small_log
    tranche = sorted(glob.glob(f"{d}/tranche-*"))[0]
    schema = spark.read.parquet(tranche).schema

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tranche)
    )
    out = conversation_state(src)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_state")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per (conv, batch); the final row per conv
        # (max events_seen — cumulative, so monotone) is the live state
        live = (
            spark.sql("SELECT * FROM conv_state")
            .groupBy("conv_id")
            .agg(
                F.max("events_seen").alias("events_seen"),
                F.max("distinct_turns").alias("distinct_turns"),
                F.max("last_ts_us").alias("last_ts_us"),
            )
        )
        got = {r["conv_id"]: (r["events_seen"], r["distinct_turns"], r["last_ts_us"])
               for r in live.collect()}
    finally:
        q.stop()

    batch = spark.read.parquet(tranche)
    want = {
        r["conv_id"]: (r["n"], r["dt"], r["lt"])
        for r in batch.groupBy("conv_id").agg(
            F.count("*").alias("n"),
            F.countDistinct("turn_idx").alias("dt"),
            (F.max(F.col("ts").cast("timestamp").cast("long")) * 1_000_000).alias("lt"),
        ).collect()
    }
    assert got == want
