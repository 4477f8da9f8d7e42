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


def _partition_ids(tranche_dir: str, cap: int = 64) -> list[int] | None:
    """Source-partition universe of a tranche from parquet footer stats only
    (no data IO). Lets apply_batch fold the offset-range bookkeeping into the
    write job as Observation metrics (one Spark action per batch). Returns
    None — the separate-aggregate fallback — when stats are missing or the
    id range is too wide for conditional aggregates."""
    lo, hi = None, None
    for f in sorted(glob.glob(os.path.join(tranche_dir, "*.parquet"))):
        md = pq.read_metadata(f)
        try:
            idx = md.schema.names.index("partition")
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None or hi - lo + 1 > cap:
        return None
    return list(range(int(lo), int(hi) + 1))


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
        pids = _partition_ids(tranche)
        df = spark.read.parquet(tranche)
        late_decode = decode_payload and "payload" in df.columns
        if late_decode:
            # the mandated ingest shape (input_hint): events arrive encoded.
            # The raw columns are dropped here; apply_batch reconstructs them
            # from the JSON payload AFTER LWW dedup — winners are chosen by
            # (ts, offset, partition) alone, so only winner payloads are ever
            # parsed (at a 10:1 update ratio that is 90% less JSON work, the
            # apply path's dominant and worst-scaling CPU).
            df = df.drop("role", "text", "tool")
        elif normalize:
            from mimic_iv_etl_spark.functions import normalize_text

            df = df.withColumn("text", normalize_text(F.col("text")))
        if drop_payload and not late_decode and "payload" in df.columns:
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
                                dedup_mode=dedup_mode, write_salt=write_salt,
                                decode_payload=late_decode,
                                normalize=normalize and late_decode,
                                source_partitions=pids)
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
