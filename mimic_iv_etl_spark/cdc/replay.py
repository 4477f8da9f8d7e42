"""Change-log replay driver: deterministic micro-batches + checkpoint resume.

Replays a change log (directory of ``tranche-*/part-*.parquet``, see
``changelog.py``) through :func:`apply_batch` in per-source-partition offset
order — the engine-side equivalent of tailing a binlog/WAL.

Delivery contract (the binlog/Kafka contract): events of one source
partition arrive in non-decreasing offset order across batches. Under that
contract the table's committed ``applied_offsets`` high-water marks are a
complete checkpoint: on restart, replay skips fully-applied offset windows
without touching data, partially-applied windows are re-filtered row-level by
``apply_batch``, and re-delivered events reduce to no-ops (exactly-once).

Tranches are processed sequentially, each read with its own written schema —
so a schema-evolution point mid-log reaches the table exactly when the first
evolved batch does, not retroactively.
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mimic_iv_etl_spark.cdc.apply import apply_batch
from mimic_iv_etl_spark.lake.table import LakeTable


def _tranche_dirs(log_dir: str) -> list[str]:
    out = sorted(glob.glob(os.path.join(log_dir, "tranche-*")))
    if not out:
        raise FileNotFoundError(f"no tranches under {log_dir}")
    return out


def _offset_bounds(tranche_dir: str) -> tuple[int, int]:
    """(min, max) offset across the tranche, from parquet footer stats only."""
    lo, hi = None, None
    for f in sorted(glob.glob(os.path.join(tranche_dir, "*.parquet"))):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("offset")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        raise ValueError(f"no offset stats in {tranche_dir}")
    return int(lo), int(hi)


def replay_log(
    spark: SparkSession,
    log_dir: str,
    table_path: str,
    schema=None,
    batch_offsets: int = 100_000,
    n_buckets: int = 32,
    dedup_mode: str = "agg",
    compact_every: int | None = None,
    drop_payload: bool = True,
    write_salt: int = 1,
    auto_compact_deltas: int | None = None,
    decode_payload: bool = False,
    normalize: bool = False,
) -> dict:
    """Replay the whole log into the table at ``table_path`` (created with
    ``schema`` if absent). ``batch_offsets`` sets the per-partition offset
    width of each micro-batch. Returns aggregate throughput stats
    (apply-loop wall time only, fixture IO excluded — BASELINE.md protocol).
    """
    if LakeTable.exists(table_path):
        table = LakeTable(spark, table_path)
    else:
        if schema is None:
            raise ValueError("schema required to create a new table")
        table = LakeTable.create(spark, table_path, schema, n_buckets=n_buckets)

    total_applied = 0
    n_batches = 0
    n_skipped_windows = 0
    batch_seq = 0
    t0 = time.monotonic()

    for tranche in _tranche_dirs(log_dir):
        lo, hi = _offset_bounds(tranche)
        df = spark.read.parquet(tranche)
        if decode_payload and "payload" in df.columns:
            # the mandated ingest shape (input_hint): events arrive encoded;
            # reconstruct the data columns from the JSON payload (JVM
            # from_json) — Catalyst prunes the decode out of jobs that don't
            # touch the decoded columns (e.g. the offset-range aggregate)
            from mimic_iv_etl_spark.functions import decode_payload_json

            df = (
                decode_payload_json(df.drop("role", "text", "tool"))
                .withColumnRenamed("role_decoded", "role")
                .withColumnRenamed("text_decoded", "text")
                .withColumnRenamed("tool_decoded", "tool")
            )
        if normalize:
            from mimic_iv_etl_spark.functions import normalize_text

            df = df.withColumn("text", normalize_text(F.col("text")))
        if drop_payload and "payload" in df.columns:
            df = df.drop("payload")
        start = lo
        while start <= hi:
            end = start + batch_offsets  # exclusive
            # checkpoint resume: skip windows fully below every high-water mark
            applied = table.applied_offsets
            if applied and len(applied) > 0 and end - 1 <= min(applied.values()):
                n_skipped_windows += 1
                start = end
                continue
            batch = df.filter((F.col("offset") >= start) & (F.col("offset") < end))
            stats = apply_batch(table, batch, batch_id=batch_seq,
                                dedup_mode=dedup_mode, write_salt=write_salt)
            batch_seq += 1
            total_applied += stats["events_applied"]
            if stats["skipped"]:
                n_skipped_windows += 1
            else:
                n_batches += 1
            if compact_every and n_batches and n_batches % compact_every == 0:
                table.compact()
            elif auto_compact_deltas:
                table.maybe_compact(auto_compact_deltas)
            start = end

    secs = time.monotonic() - t0
    return {
        "events_applied": total_applied,
        "batches": n_batches,
        "skipped_windows": n_skipped_windows,
        "seconds": secs,
        "events_per_sec": total_applied / secs if secs > 0 else 0.0,
        "snapshot_version": table.version,
    }
