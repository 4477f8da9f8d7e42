"""Structured Streaming shell: tail the change log → foreachBatch apply.

The production shape mandated by the north star: ``readStream`` over the
change log (file source here; Kafka-shaped in design — both deliver
per-source-partition offset order), ``foreachBatch(apply_batch)`` as the
exactly-once MERGE sink, offsets checkpointed via ``checkpointLocation``.

Two independent layers make restart exactly-once:
- Spark's streaming checkpoint replays unacknowledged source batches;
- the table's ``applied_offsets`` snapshot summary turns any re-delivered
  event into a row-level no-op (``apply.py``), covering the window where a
  batch committed to the table but the checkpoint wasn't advanced yet.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from pyspark.sql import SparkSession

from mimic_iv_etl_spark.cdc.apply import apply_batch
from mimic_iv_etl_spark.lake.table import LakeTable


def stream_tranche(
    spark: SparkSession,
    tranche_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    dedup_mode: str = "agg",
    on_batch: Callable[[int, dict], None] | None = None,
    drop_payload: bool = True,
    decode_payload: bool = False,
    normalize: bool = False,
) -> None:
    """Stream one log tranche (single fixed schema) into ``table`` with an
    ``availableNow`` trigger; returns when the tranche is fully applied.

    ``decode_payload``/``normalize`` run on LWW winners only inside
    ``apply_batch`` (the encoded-ingest shape); the per-partition offset
    bookkeeping rides each micro-batch's write job as Observation metrics
    (universe from the tranche's parquet footer stats).

    ``on_batch(epoch_id, stats)`` is a test hook (e.g. to crash mid-stream).
    """
    from mimic_iv_etl_spark.cdc.replay import _partition_ids

    pids = _partition_ids(tranche_dir)
    sample = sorted(glob.glob(os.path.join(tranche_dir, "*.parquet")))
    if not sample:
        raise FileNotFoundError(tranche_dir)
    schema = spark.read.parquet(sample[0]).schema

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")  # preserve per-partition offset order
        .parquet(tranche_dir)
    )
    late_decode = decode_payload and "payload" in src.columns
    if late_decode:
        src = src.drop("role", "text", "tool")
    elif drop_payload and "payload" in src.columns:
        src = src.drop("payload")

    def _apply(batch_df, epoch_id: int) -> None:
        stats = apply_batch(table, batch_df, batch_id=epoch_id,
                            dedup_mode=dedup_mode,
                            decode_payload=late_decode,
                            normalize=normalize,
                            source_partitions=pids)
        if on_batch is not None:
            on_batch(epoch_id, stats)

    q = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_log(
    spark: SparkSession,
    log_dir: str,
    table_path: str,
    checkpoint_root: str,
    schema=None,
    n_buckets: int = 32,
    max_files_per_trigger: int = 1,
    dedup_mode: str = "agg",
    on_batch: Callable[[int, dict], None] | None = None,
    decode_payload: bool = False,
    normalize: bool = False,
) -> LakeTable:
    """Stream every tranche of the log in order (one streaming query per
    tranche, each with its own checkpoint — schema evolution happens at the
    tranche boundary, exactly as in batch replay)."""
    if LakeTable.exists(table_path):
        table = LakeTable(spark, table_path)
    else:
        if schema is None:
            raise ValueError("schema required to create a new table")
        table = LakeTable.create(spark, table_path, schema, n_buckets=n_buckets)
    for tranche in sorted(glob.glob(os.path.join(log_dir, "tranche-*"))):
        ckpt = os.path.join(checkpoint_root, os.path.basename(tranche))
        stream_tranche(
            spark,
            tranche,
            table,
            ckpt,
            max_files_per_trigger=max_files_per_trigger,
            dedup_mode=dedup_mode,
            on_batch=on_batch,
            decode_payload=decode_payload,
            normalize=normalize,
        )
        # per-tranche durability point: fold the driver-local lineage/metrics
        # JSONL tails into cluster-durable parquet (one tiny job, off the
        # per-batch hot path)
        from mimic_iv_etl_spark.cdc.metrics import flush_sidecars

        flush_sidecars(spark, table.path)
    return table
